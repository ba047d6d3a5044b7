package graft.ingest

import graft.SparkSuite
import java.nio.file.{Files, Paths}

class IncrementalSpec extends SparkSuite {

  test("batch manifest: each file processed exactly once across runs") {
    val root = Files.createTempDirectory("graft-inc").toString
    val in = s"$root/in"; val manifest = s"$root/manifest"
    Files.createDirectories(Paths.get(in))
    Files.write(Paths.get(in, "s1.csv"), "a\n".getBytes)
    Files.write(Paths.get(in, "s2.csv"), "b\n".getBytes)
    Files.write(Paths.get(in, "ignore.txt"), "c\n".getBytes)

    var processed = Vector.empty[Seq[String]]
    def run() = Incremental.runBatch(spark, in, manifest)(fs => processed :+= fs)

    val first = run()
    assert(first.map(p => p.substring(p.lastIndexOf('/') + 1)) == Seq("s1.csv", "s2.csv"))

    val second = run()
    assert(second.isEmpty, "rerun with no new files must be the end_pipeline branch")
    assert(processed.size == 1)

    Files.write(Paths.get(in, "s3.csv"), "d\n".getBytes)
    val third = run()
    assert(third.map(p => p.substring(p.lastIndexOf('/') + 1)) == Seq("s3.csv"))
    assert(processed.size == 2 && processed(1).size == 1)
  }
}

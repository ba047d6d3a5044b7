package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Artifact-layer invariants: fingerprint path sensitivity, the pending
  * mutation marker (crash-atomicity of appends/compactions), and the
  * generic compaction pass.
  */
class ArtifactSpec extends SparkSuite {
  import spark.implicits._

  private val base = "target/artifactspec"

  test("fileFingerprint keys by path relative to the input root, not bare file name") {
    deleteRecursively(s"$base/fp")
    val a = new java.io.File(s"$base/fp/in/suba"); a.mkdirs()
    val b = new java.io.File(s"$base/fp/in/subb"); b.mkdirs()
    val f = new java.io.File(a, "part.txt")
    java.nio.file.Files.writeString(f.toPath, "payload")
    f.setLastModified(1700000000000L)
    val before = Artifact.fileFingerprint(spark, s"$base/fp/in")
    // relocate between subdirs of the SAME input, identical name, size,
    // and mtime — only the relative path changes
    val g = new java.io.File(b, "part.txt")
    java.nio.file.Files.move(f.toPath, g.toPath)
    g.setLastModified(1700000000000L)
    val after = Artifact.fileFingerprint(spark, s"$base/fp/in")
    assert(before != after,
      "moving a file between subdirectories must change the digest")
  }

  test("pending mutation marker: ensure rebuilds, requireKind refuses") {
    val dir = s"$base/pending"
    deleteRecursively(dir)
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    def build(): Unit =
      df.write.mode("overwrite").parquet(s"$dir/data")
    Artifact.ensure(spark, dir, "toy v1 fp=0:0")(build())
    val marker = new java.io.File(s"$dir/data/_SUCCESS")
    val t1 = marker.lastModified()
    Artifact.ensure(spark, dir, "toy v1 fp=0:0")(build())
    assert(marker.lastModified() == t1, "matching meta must serve, not rebuild")

    // simulate a crash mid-append: marker written, fingerprint bump never ran
    Artifact.beginMutation(spark, dir)
    intercept[IllegalStateException] {
      Artifact.requireKind(spark, dir, "toy ")
    }
    // compaction must refuse too — it would bake the half-append in and
    // clear the marker, reopening the stale-serve window
    intercept[IllegalStateException] {
      Artifact.compactParquet(spark, dir, "data")
    }
    Artifact.ensure(spark, dir, "toy v1 fp=0:0")(build())
    assert(marker.lastModified() != t1,
      "a pending mutation must force a rebuild even when the meta matches")
    assert(!Artifact.hasPendingMutation(spark, dir),
      "a successful rebuild must clear the pending marker")
    Artifact.requireKind(spark, dir, "toy ") // serves again
  }

  test("compactParquet: fewer files, identical content, meta verbatim") {
    val dir = s"$base/compact"
    deleteRecursively(dir)
    val df = (0 until 1000).map(i => (i.toLong, i % 7)).toDF("id", "k")
    Artifact.ensure(spark, dir, "toy v1 fp=1:1") {
      df.repartition(8).write.mode("overwrite").parquet(s"$dir/data")
    }
    val contentBefore = spark.read.parquet(s"$dir/data")
      .as[(Long, Int)].collect().sorted.toSeq
    val (f0, f1) = Artifact.compactParquet(spark, dir, "data")
    assert(f0 == 8 && f1 < f0, s"file count must drop: $f0 -> $f1")
    assert(Artifact.readMeta(spark, dir).contains("toy v1 fp=1:1"),
      "compaction must not touch the metadata line")
    assert(!Artifact.hasPendingMutation(spark, dir))
    val contentAfter = spark.read.parquet(s"$dir/data")
      .as[(Long, Int)].collect().sorted.toSeq
    assert(contentAfter == contentBefore, "compaction must not change content")
  }

  test("compactParquet merge transform rewrites rows consumer-equivalently") {
    val dir = s"$base/compact_merge"
    deleteRecursively(dir)
    Artifact.ensure(spark, dir, "toy v1 fp=2:2") {
      Seq((1, 10L), (1, 5L), (2, 1L)).toDF("k", "m")
        .repartition(3).write.mode("overwrite").parquet(s"$dir/data")
    }
    Artifact.compactParquet(spark, dir, "data",
      merge = _.groupBy(col("k")).agg(sum(col("m")).as("m")))
    val sums = spark.read.parquet(s"$dir/data")
      .groupBy(col("k")).agg(sum(col("m")).as("m"))
      .as[(Int, Long)].collect().toMap
    assert(sums == Map(1 -> 15L, 2 -> 1L),
      "the consumer aggregate must be unchanged by the merge")
  }
}

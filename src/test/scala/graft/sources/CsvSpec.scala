package graft.sources

import graft.SparkSuite
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types._

class CsvSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("PERMISSIVE read: clean rows kept, malformed rows quarantined") {
    val dir = Files.createTempDirectory("graft-csv").toString
    Files.write(Paths.get(dir, "a.csv"),
      "id,name,score\n1,ann,1.5\nnot-a-long,bob,2.5\n3,cyd,oops\n4,dee,4.5\n".getBytes)
    val clean = Csv.readClean(spark, dir, schema).orderBy("id").collect()
    // row 2: id unparseable → corrupt; row 3: score unparseable → corrupt
    assert(clean.map(_.getLong(0)).toSeq == Seq(1L, 4L))
    val corrupt = Csv.corruptRows(spark, dir, schema).collect()
    assert(corrupt.length == 2)
    assert(corrupt.exists(_.getString(0).startsWith("not-a-long")))
  }

  test("round-trip preserves doubles exactly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-csv-rt").toString + "/out"
    val src = Seq((1L, "x", 0.1 + 0.2), (2L, "y", 123.456e-7)).toDF("id", "name", "score")
    Csv.write(src, dir)
    val back = Csv.readClean(spark, dir, schema).orderBy("id").collect()
    assert(back(0).getDouble(2) == 0.1 + 0.2)
    assert(back(1).getDouble(2) == 123.456e-7)
  }
}

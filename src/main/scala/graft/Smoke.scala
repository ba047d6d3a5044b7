package graft

import org.apache.spark.sql.SparkSession

/** Local smoke: exercises the driver's t1 gate (`SparkEntry.entry` on
  * sf0.001 must return >0 rows) exactly as the driver would.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // cast-or-null coercion semantics (reference validate.py errors="coerce")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows=$n schema=${df.schema.simpleString}")
    assert(n > 0, "entry() returned 0 rows")
    spark.stop()
  }
}

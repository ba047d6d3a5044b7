package graft

/** Local smoke: exercises the driver's t1 gate (`SparkEntry.entry` on
  * sf0.001 must return >0 rows) exactly as the driver would.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("4")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows=$n schema=${df.schema.simpleString}")
    assert(n > 0, "entry() returned 0 rows")
    spark.stop()
  }
}

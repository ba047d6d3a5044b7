package graft

/** Time individual registered queries at any fixture: each query runs
  * twice and reports cold (first run — includes any artifact build it
  * triggers) and warm (second run — serve cost) seconds as one JSON
  * line per query. The scale-slope companion to Bench: Bench times the
  * whole suite at the round fixture; this times chosen queries at
  * synthetic scale points.
  *
  * Usage: `runMain graft.QueryTime <sfDir> <query> [query...]`
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryTime <sfDir> <query> [query...]")
    val sfDir = args(0)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    // absorb session startup so the first query's cold time is its own
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => () }
    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime(); GraftSession.forceAndCount(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      val warm = once()
      println(s"""{"query":"$name","cold_sec":$cold,"warm_sec":$warm,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}

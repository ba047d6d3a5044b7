package graft

/** Scale evidence for the co-located bucketed join
  * ([[graft.analytics.Bucketed]]): time the bucketed vs raw-parquet
  * fact⋈fact join at a given fixture and report the join-exchange
  * counts — the point is that at the scale where the raw join's
  * shuffle dominates (q3's broadcast→SMJ graduation at 30×), the
  * bucketed layout still plans zero join exchanges and the per-query
  * cost difference is the shuffle it amortized away.
  *
  * Usage: `runMain graft.BucketScale [sfDir]` — prints one JSON line.
  */
object BucketScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange hashpartitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString).size

    val buildSec = timed(graft.analytics.Bucketed.ensureTables(spark, sfDir))
    // warm both paths once (file listing, codegen), then measure
    graft.analytics.Bucketed.salesByPriority(spark, sfDir).count()
    graft.analytics.Bucketed.salesByPriorityUnbucketed(spark, sfDir).count()
    val bucketedSec = timed(graft.analytics.Bucketed.salesByPriority(spark, sfDir).count())
    val rawSec = timed(graft.analytics.Bucketed.salesByPriorityUnbucketed(spark, sfDir).count())
    val nB = exchanges(graft.analytics.Bucketed.salesByPriority(spark, sfDir))
    val nR = exchanges(graft.analytics.Bucketed.salesByPriorityUnbucketed(spark, sfDir))

    println(s"""{"metric":"bucketed_join_sec","value":$bucketedSec,"unit":"sec","raw_join_sec":$rawSec,"build_sec":$buildSec,"bucketed_exchanges":$nB,"raw_exchanges":$nR,"sf":"$sfDir"}""")
    spark.stop()
  }
}

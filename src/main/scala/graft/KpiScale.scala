package graft

import org.apache.spark.sql.functions._

/** Scale evidence for the round-10 analytics family (KMV distinct,
  * retention cohorts, event funnel) plus the exact-KPI reference
  * point: times each query warm (second run reported) at the given
  * fixture dirs — the ScaleUp sf1/sf10 trees give the 10×/100× event
  * slopes. Prints one JSON line per dir.
  *
  * Usage: `runMain graft.KpiScale [sfDir...]`
  */
object KpiScale {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "target/sf1", "target/sf10")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("a1_genre_kpis", "a9_kmv_distinct",
      "a13_retention_cohorts", "a14_event_funnel")
    for (d <- dirs) {
      // untimed warm read of the inputs (page cache + footer listing)
      Tables.events(spark, d).foreach(_ => ())
      Tables.customer(spark, d).foreach(_ => ())
      val times = names.map { n =>
        val fn = SparkEntry.queries(n)
        GraftSession.forceAndCount(fn(spark, d)) // warm run
        val t0 = System.nanoTime()
        GraftSession.forceAndCount(fn(spark, d))
        n -> (System.nanoTime() - t0) / 1e9
      }
      val qs = times.map { case (k, v) => f""""$k":$v%.3f""" }.mkString(",")
      println(s"""{"dir":"$d",$qs}""")
    }
    spark.stop()
  }
}

package graft

/** Dev diagnostic: time registered queries steady-state (run 3×, report
  * min) under runtime-settable config variations, in ONE JVM — so a
  * knob's effect is measured without host drift. Also prints a raw
  * job-round latency probe (empty-ish jobs) to calibrate the per-job
  * fixed cost at this core count.
  *
  *   SPARK_GRAFT_KNOB="spark.sql.adaptive.enabled=false" \
  *     sbt "runMain graft.DiagKnobs a3_w1_top_songs w4_moving_avg"
  */
object DiagKnobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    for (t <- Seq("orders", "lineitem", "events", "documents", "embeddings"))
      try spark.read.parquet(s"$sfDir/$t.parquet").foreach(_ => ())
      catch { case _: Throwable => () }
    // raw job-round latency: N sequential tiny jobs
    def jobProbe(n: Int, parts: Int): Double = {
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => spark.sparkContext.parallelize(1 to parts, parts).count())
      (System.nanoTime() - t0) / 1e9 / n
    }
    println(f"[knob] job-round latency 1-task=${jobProbe(20, 1)}%.4f s  32-task=${jobProbe(20, 32)}%.4f s")
    val knobs = sys.env.getOrElse("SPARK_GRAFT_KNOB", "")
      .split(';').filter(_.contains('=')).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    knobs.foreach { case (k, v) => spark.conf.set(k, v); println(s"[knob] set $k=$v") }
    args.foreach { name =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        GraftSession.forceAndCount(SparkEntry.queries(name)(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[knob] $name min=${times.min}%.3f runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}

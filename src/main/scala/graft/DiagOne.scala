package graft

/** Dev diagnostic: split a registered query's wall time into plan
  * CONSTRUCTION (the queries-map closure, including any eager
  * localCheckpoint / artifact ensure it runs), OPTIMIZATION (analysis →
  * executedPlan), and EXECUTION (the forceAndCount action), plus the
  * job/stage/task counts the action scheduled — the numbers that tell
  * whether a flat per-query second is Catalyst, scheduling, or compute.
  * `sbt "runMain graft.DiagOne <query> [query...]"`
  */
object DiagOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => () }
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (sys.env.contains("SPARK_GRAFT_DIAG_JOBS"))
          println(s"[diagjob] ${j.jobId} " +
            s"${j.stageInfos.lastOption.map(_.name).getOrElse("?").take(120)}")
        ()
      }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks); ()
      }
    })
    // per-ACTION attribution: every eager action (count/collect/
    // checkpoint/write) fires this with its QueryExecution — the
    // construct-phase storm decomposed by call, not by job id
    if (sys.env.contains("SPARK_GRAFT_DIAG_ACTIONS"))
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = {
            val head = qe.analyzed.treeString.linesIterator
              .take(3).mkString(" | ").take(200)
            println(f"[diagact] $funcName ${durationNs / 1e9}%.3f $head")
          }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
    args.foreach { name =>
      (1 to 2).foreach { i =>
        jobs.set(0); stages.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        val consJobs = jobs.get // jobs fired during construction (ensure/ckpt)
        df.queryExecution.executedPlan // force analysis + optimization
        val t2 = System.nanoTime()
        GraftSession.forceAndCount(df)
        val t3 = System.nanoTime()
        println(f"[diag] $name run$i construct=${(t1 - t0) / 1e9}%.3f" +
          f" (jobs=$consJobs) optimize=${(t2 - t1) / 1e9}%.3f" +
          f" execute=${(t3 - t2) / 1e9}%.3f total=${(t3 - t0) / 1e9}%.3f" +
          f" jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
      }
    }
    spark.stop()
  }
}

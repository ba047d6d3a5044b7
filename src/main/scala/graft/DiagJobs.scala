package graft

/** Dev diagnostic: per-JOB wall durations for a registered query's
  * second (steady-state) run — job storms are not uniform, so the fix
  * targets the few heavy jobs, not the count.
  * `sbt "runMain graft.DiagJobs <query>"`
  */
object DiagJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => () }
    case class J(id: Int, start: Long, var end: Long = -1,
                 var stages: Int = 0, var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.put(j.jobId, J(j.jobId, j.time)); order.add(j.jobId); ()
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobs.get(j.jobId)).foreach(_.end = j.time); ()
      }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        import scala.jdk.CollectionConverters._
        jobs.values.asScala.lastOption.foreach { _ => }
        ()
      }
    })
    args.foreach { name =>
      // run1 warms; run2 is measured with per-job detail
      SparkEntry.queries(name)(spark, sfDir)
      GraftSession.forceAndCount(SparkEntry.queries(name)(spark, sfDir))
      jobs.clear(); order.clear()
      Thread.sleep(300)
      val t0 = System.currentTimeMillis()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val tC = System.currentTimeMillis()
      GraftSession.forceAndCount(df)
      val tE = System.currentTimeMillis()
      Thread.sleep(500) // let the listener bus drain
      import scala.jdk.CollectionConverters._
      val js = order.asScala.toSeq.flatMap(id => Option(jobs.get(id)))
      println(f"[dj] $name construct=${(tC - t0) / 1000.0}%.3f execute=${(tE - tC) / 1000.0}%.3f njobs=${js.size}")
      var prevEnd = t0
      js.foreach { j =>
        val dur = if (j.end > 0) (j.end - j.start) / 1000.0 else -1
        val gap = (j.start - prevEnd) / 1000.0
        prevEnd = if (j.end > 0) j.end else j.start
        println(f"[dj]   job${j.id}%4d gap=$gap%7.3f dur=$dur%7.3f")
      }
    }
    spark.stop()
  }
}

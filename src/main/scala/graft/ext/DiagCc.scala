package graft.ext

import org.apache.spark.sql.functions._

/** Dev diagnostic: A/B the two connected-component engines on the
  * image rep-pair graph in one JVM (label propagation vs alternating
  * star contraction), plus job counts; verifies identical output.
  */
object DiagCc {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    val docs = graft.Tables.documents(spark, d)
    val dir = MediaFeatures.defaultDir(d)
    MediaFeatures.ensure(spark, docs, dir)
    // the rep pair graph the image-group queries feed the engine
    val stored = MediaFeatures.features(spark, dir)
      .select(col("doc_id"), col("dhash").as("sig"))
      .filter(col("sig").isNotNull)
    val sigs = stored.localCheckpoint()
    val reps = sigs.groupBy(col("sig")).agg(min(col("doc_id")).as("rep_id"))
      .select(col("rep_id").as("doc_id"), col("sig")).localCheckpoint()
    val pairs = Dedup.hammingPairs(reps, 3, 256).localCheckpoint()
    println(s"[cc] pairs=${pairs.count()} reps=${reps.count()}")
    (1 to 3).foreach { r =>
      jobs.set(0); var t0 = System.nanoTime()
      val a = Dedup.duplicateGroupsDistributed(pairs)
      val na = a.count()
      println(f"[cc] run$r label  ${(System.nanoTime() - t0) / 1e9}%.3f s jobs=${jobs.get} rows=$na")
      jobs.set(0); t0 = System.nanoTime()
      val b = Dedup.starContractionGroupsDistributed(pairs)
      val nb = b.count()
      println(f"[cc] run$r star   ${(System.nanoTime() - t0) / 1e9}%.3f s jobs=${jobs.get} rows=$nb")
      if (r == 1) {
        val diff = a.withColumnRenamed("group_id", "ga")
          .join(b.withColumnRenamed("group_id", "gb"), Seq("doc_id"), "full")
          .filter(not(col("ga") <=> col("gb"))).count()
        println(s"[cc] label-vs-star mismatched rows: $diff")
      }
    }
    spark.stop()
  }
}

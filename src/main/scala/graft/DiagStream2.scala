package graft

import org.apache.spark.sql.functions._

/** Dev diagnostic: decompose one upsert-log stream query
  * (stream_cms_update shape) into lifecycle phases with per-batch
  * durationMs, run twice in one JVM.
  */
object DiagStream2 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.read.parquet(s"$d/events.parquet").count()
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries("stream_cms_update")(spark, d)
      val t1 = System.nanoTime()
      GraftSession.forceAndCount(df)
      val t2 = System.nanoTime()
      println(f"[ds2] run$i construct(stream)=${(t1 - t0) / 1e9}%.3f serve=${(t2 - t1) / 1e9}%.3f")
      spark.streams.active.foreach(_.stop())
    }
    // decomposed: the streaming write alone, then snapshot+serve alone.
    // DS2_P mirrors the production streamSession tuning (state/shuffle
    // partition count for the stream run); unset = session default.
    val sp = sys.env.get("DS2_P") match {
      case Some(p) =>
        val c = spark.newSession()
        c.conf.set("spark.sql.shuffle.partitions", p)
        c
      case None => spark
    }
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val ev = sp.readStream
        .schema(spark.read.parquet(s"$d/events.parquet").schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(d)
      val cells = Tables.normalizeEvents(ev)
        .filter(col("user_id").isNotNull)
        .select(to_date(col("ts")).as("date"),
          posexplode(graft.functions.native.cms_buckets(
            col("user_id").cast("string"), 4)).as(Seq("row_i", "bucket")))
        .groupBy(col("date"), col("row_i"), col("bucket"))
        .agg(count(lit(1)).as("c"))
      val store = java.nio.file.Files.createTempDirectory("ds2-store").toString
      val ckpt = java.nio.file.Files.createTempDirectory("ds2-ckpt").toString
      val t05 = System.nanoTime()
      val q = cells.writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          val mode = sys.env.getOrElse("DS2_MODE", "parquet32")
          val tb = System.nanoTime()
          mode match {
            case "noop" =>
              batch.withColumn("batch_id", lit(id))
                .write.format("noop").mode("overwrite").save()
            case "coalesce1" =>
              batch.withColumn("batch_id", lit(id)).coalesce(1)
                .write.mode("append").parquet(store)
            case "coalesce4" =>
              batch.withColumn("batch_id", lit(id)).coalesce(4)
                .write.mode("append").parquet(store)
            case _ =>
              batch.withColumn("batch_id", lit(id))
                .write.mode("append").parquet(store)
          }
          println(f"[ds2]   foreachBatch $mode write ${(System.nanoTime() - tb) / 1e9}%.3f")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val t11 = System.nanoTime()
      q.recentProgress.foreach { p =>
        println(s"[ds2]   batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
      }
      println(f"[ds2] decomposed run$i plan=${(t05 - t0) / 1e9}%.3f stream=${(t11 - t05) / 1e9}%.3f")
      graft.Fs.deleteTree(store); graft.Fs.deleteTree(ckpt)
    }
    spark.stop()
  }
}

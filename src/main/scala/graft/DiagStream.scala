package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev diagnostic for the streaming fixed cost: run the
  * stream_daily_counts shape twice and print Spark's own per-batch
  * duration breakdown (triggerExecution, queryPlanning, walCommit, …)
  * plus wall segments (start→first progress, awaitTermination).
  */
object DiagStream {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.read.parquet(s"$d/events.parquet").count()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val raw = spark.readStream
        .schema(spark.read.parquet(s"$d/events.parquet").schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(d)
      val q = Tables.normalizeEvents(raw)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(s"diag_$i")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      val t1 = System.nanoTime()
      q.awaitTermination()
      val t2 = System.nanoTime()
      println(f"[diagstream] run$i start=${(t1 - t0) / 1e9}%.3f await=${(t2 - t1) / 1e9}%.3f")
      q.recentProgress.foreach { p =>
        println(s"[diagstream]   batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
      }
    }
    spark.stop()
  }
}

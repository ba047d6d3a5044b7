package graft.stream

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming semantics exposed through the batch query contract: a
  * Structured Streaming file source run with `Trigger.AvailableNow`
  * against the fixture parquet, aggregated into a memory sink. The final
  * table must equal the batch aggregation — which is exactly what the
  * DuckDB oracle checks.
  */
object StreamQueries {

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.9: incremental file-source micro-batching; complete-mode agg.
    "stream_daily_counts" -> ((s, d) => {
      val name = s"stream_daily_counts_${counter.incrementAndGet()}"
      // Raw on-disk schema (ts as nanos-long under nanosAsLong=true);
      // normalize inside the stream like the batch path does.
      val rawSchema = s.read.parquet(s"$d/events.parquet").schema
      val q = Tables.normalizeEvents(
        s.readStream
          .schema(rawSchema)
          .option("pathGlobFilter", "events.parquet") // S6-style name filter
          .parquet(d))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          Tables.dsum(col("value")).as("total_value"))
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name).orderBy(col("event_type"))
    })
  )

  val oracles: Map[String, String] = Map(
    "stream_daily_counts" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin
  )
}

package graft.stream

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streamed media ingestion gate: the decode is per-row deterministic
  * and the aggregation associative, so the gate's table must be
  * BATCHING-INVARIANT (same result at any micro-batch cut) and equal
  * the batch decode over the same spool — with the planted corrupt
  * arrivals landing in the width=−1 quarantine bucket instead of
  * failing the stream.
  */
class MediaGateSpec extends SparkSuite {
  import spark.implicits._

  test("streamed decode gate: multi-batch == registered one-shot == batch decode") {
    val gate = StreamQueries.queries("stream_media_gate")
    val result = gate(spark, sfDir).collect()

    // quarantine accounting: the planted corrupt set is exactly
    // doc_id % 97 == 0 over 0..499 → 6 docs in the -1 bucket
    val rejected = result.filter(_.getLong(0) == -1L)
    assert(rejected.length == 1 && rejected.head.getLong(1) == 6L &&
      rejected.head.getLong(2) == 0L, s"quarantine bucket: ${rejected.toSeq}")

    // batch twin over the same spool: identical table
    val spool = graft.ext.Multimodal.ensureMediaGateSpool(spark, sfDir)
    val batch = spark.read.parquet(spool)
      .select(graft.functions.native.ppm_decode_stats(col("media")).as("dec"))
      .select(coalesce(col("dec.width"), lit(-1L)).as("width"),
        coalesce(col("dec.r_sum"), lit(0L)).as("r_sum"))
      .groupBy(col("width"))
      .agg(count(lit(1)).as("n_docs"), sum(col("r_sum")).as("total_r"))
      .orderBy(col("width")).collect()
    assert(result.toSeq == batch.toSeq, "stream table must equal batch decode")

    // batching invariance: the same spool delivered one FILE per
    // micro-batch (maxFilesPerTrigger=1, 8 spool files → 8 commits
    // through the sink's log) yields the same table
    val out = java.nio.file.Files.createTempDirectory("mgspec-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("mgspec-ckpt").toString
    try {
      import org.apache.spark.sql.types._
      val q = spark.readStream
        .schema(StructType(Seq(StructField("doc_id", LongType),
          StructField("media", BinaryType))))
        .option("maxFilesPerTrigger", "1")
        .parquet(spool)
        .select(graft.functions.native.ppm_decode_stats(col("media")).as("dec"))
        .select(coalesce(col("dec.width"), lit(-1L)).as("width"),
          coalesce(col("dec.r_sum"), lit(0L)).as("r_sum"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val multi = spark.read.parquet(out)
        .groupBy(col("width"))
        .agg(count(lit(1)).as("n_docs"), sum(col("r_sum")).as("total_r"))
        .orderBy(col("width")).collect()
      assert(multi.toSeq == result.toSeq,
        "per-file micro-batching must not change the gate's table")
    } finally {
      graft.Fs.deleteTree(out); graft.Fs.deleteTree(ckpt)
    }

    // clean-side certification: total decoded docs = corpus minus the
    // quarantined set, and every clean doc's decoded width is in the
    // synth range
    val clean = result.filter(_.getLong(0) >= 0L)
    assert(clean.map(_.getLong(1)).sum ==
      Tables.documents(spark, sfDir).count() - 6L)
    assert(clean.forall(r => r.getLong(0) >= 32L && r.getLong(0) <= 95L))
  }
}

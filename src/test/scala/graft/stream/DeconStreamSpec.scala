package graft.stream

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Ingest-time decontamination: the gate is per-document deterministic
  * (a probe against a static Bloom artifact), so the admitted corpus
  * must be BATCHING-INVARIANT — the same survivors whether the stream
  * delivers one file or many micro-batches — and must equal the batch
  * decontamination answer. Cross-batch exactly-once is the parquet
  * FileStreamSink's own commit log (no manual manifest), which
  * maxFilesPerTrigger=1 exercises across several commits here.
  */
class DeconStreamSpec extends SparkSuite {
  import spark.implicits._

  test("streamed bloom gate: multi-batch == one-shot == batch filter") {
    val bench = Seq(
      (100L, "the secret benchmark passage nobody may train on ever at all")
    ).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a perfectly ordinary training document with enough tokens here"),
      // contains a full benchmark 5-gram → contaminated
      (2L, "leaked copy: the secret benchmark passage nobody may train on today"),
      (3L, "another clean document talking about something else entirely now"),
      (4L, "more clean text padding the corpus with harmless filler words")
    ).toDF("doc_id", "text")
    val sk = graft.ext.Dedup.benchmarkSketch(bench)
    def gate(df: org.apache.spark.sql.DataFrame) = df
      .filter(!exists(graft.ext.Dedup.shingleHashes(col("text"), 5),
        h => graft.functions.native.bloom_might_contain(sk, h)))
      .select(col("doc_id"))
    val srcDir = java.nio.file.Files.createTempDirectory("decon-src").toString
    val out = java.nio.file.Files.createTempDirectory("decon-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("decon-ckpt").toString
    try {
      // four single-row files → four micro-batches at maxFilesPerTrigger=1
      docs.collect().zipWithIndex.foreach { case (r, i) =>
        Seq((r.getLong(0), r.getString(1))).toDF("doc_id", "text")
          .write.parquet(s"$srcDir/f$i")
      }
      val stream = spark.readStream
        .schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$srcDir/*")
      val q = gate(stream).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val streamed = spark.read.parquet(out)
        .as[Long].collect().toSet
      val batch = gate(docs).as[Long].collect().toSet
      assert(batch == Set(1L, 3L, 4L), "doc 2 carries a benchmark 5-gram")
      assert(streamed == batch,
        "per-doc deterministic gate must be batching-invariant")
      // at least two sink commits happened (multi-batch, not one shot)
      val log = new java.io.File(s"$out/_spark_metadata")
      assert(log.isDirectory && log.listFiles().length >= 2)
    } finally {
      deleteRecursively(srcDir); deleteRecursively(out); deleteRecursively(ckpt)
    }
  }
}

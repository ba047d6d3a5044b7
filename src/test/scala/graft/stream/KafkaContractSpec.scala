package graft.stream

import graft.SparkSuite
import graft.ext.LanguageModel
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The Kafka deployment contract, exercised broker-less end to end: a
  * MemoryStream shaped EXACTLY like the connector's output (key/value
  * binary + topic/partition/offset/timestamp envelope) feeds
  * [[KafkaWireSource]], whose projection is the same code path the
  * [[KafkaSourceConfig]] branch runs — and the full curated chain
  * (quality gate → exactly-once admission → near-dup rejection →
  * corpus store + band index) consumes it in one streaming run.
  * What a real broker would add is only the network fetch; every
  * payload/offset/partition semantic the pipeline depends on is pinned
  * here.
  */
class KafkaContractSpec extends SparkSuite {
  import StreamSources.WireRecord
  import spark.implicits._

  private val valueSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def wire(docId: Long, text: String, partition: Int, offset: Long): WireRecord =
    WireRecord(
      key = docId.toString.getBytes("UTF-8"),
      value = s"""{"doc_id":$docId,"text":"$text"}""".getBytes("UTF-8"),
      topic = "documents",
      partition = partition,
      offset = offset,
      timestamp = java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      timestampType = 0)

  private val base = "target/kafkacontractspec"
  private val root = s"$base/root"
  private val lmDir = s"$base/lm"

  private val seedDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the lazy dog sleeps near the river bank while the fox jumps over"),
    (3L, "a brown fox and a lazy dog rest near the quiet river bank"))

  /** Seed corpus + LM; returns the gate threshold (seed max NLL + slack). */
  private def setUp(): Double = {
    deleteRecursively(base)
    val seed = seedDocs.toDF("doc_id", "text")
    IncrementalIngest.init(spark, seed, root)
    LanguageModel.ensureLm(spark, seed, lmDir)
    LanguageModel.score(spark, seed, lmDir)
      .agg(max(col("mean_nll"))).head().getDouble(0) + 0.5
  }

  private def runStream(ckpt: String, thr: Double,
                        records: Seq[WireRecord]): Vector[(Long, CuratedIngest.CuratedStats)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[WireRecord]
    input.addData(records: _*)
    var batches = Vector.empty[(Long, CuratedIngest.CuratedStats)]
    val q = CuratedIngest.start(spark,
      KafkaWireSource(input.toDF(), valueSchema), ckpt, root, lmDir, thr,
      onBatch = (id, s) => batches = batches :+ (id, s))
    q.awaitTermination()
    batches
  }

  test("wire projection: envelope dropped, JSON value becomes typed rows — same path as the Kafka branch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[WireRecord]
    val projected = StreamSources.open(spark,
      KafkaWireSource(input.toDF(), valueSchema))
    assert(projected.isStreaming, "the seam must preserve streaming-ness")
    assert(projected.columns.toSeq == Seq("doc_id", "text"),
      s"only the payload columns may emerge: ${projected.columns.toSeq}")
    // batch re-check of the same projection body on concrete bytes
    val batchProjected = Seq(wire(7L, "hello world", 0, 0L)).toDF()
      .select(col("value"))
    val r = batchProjected
      .select(from_json(col("value").cast("string"), valueSchema).as("p"))
      .select(col("p.*")).head()
    assert(r.getLong(0) == 7L && r.getString(1) == "hello world")
  }

  test("full chain through the wire: gate, admission, near-dup — across partitions") {
    val thr = setUp()
    // two topic partitions; offsets are per-partition and the pipeline
    // must not care about either (admission keys on doc_id + content)
    val records = Seq(
      wire(11L, "the quick fox jumps near the river bank and the dog sleeps", 0, 0L),
      wire(12L, "zxqv wjkp qqzz vbnm xkcd plmo qwer asdf zxcv tyui ghjk bnmv", 1, 0L),
      wire(13L, "the quick brown fox jumps over the lazy dog near the river bank today", 0, 1L))
    val batches = runStream(s"$base/ckpt1", thr, records)
    assert(batches.size == 1, s"AvailableNow must drain in one batch: $batches")
    val s = batches.head._2
    assert(s.batchRows == 3)
    assert(s.rejectedQuality == 1, s"the soup doc must fail the gate: $s")
    assert(s.ingest.rejectedVsCorpus == 1, s"the near-dup must be rejected: $s")
    assert(s.ingest.accepted == 1, s"the fluent unique doc must land: $s")
    val ids = IncrementalIngest.corpus(spark, root)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L, 11L), s"corpus after the streamed run: $ids")
  }

  test("broker re-delivery of the same offsets is a counted no-op; fresh offsets still admit") {
    val thr = setUp()
    val first = Seq(
      wire(11L, "the quick fox jumps near the river bank and the dog sleeps", 0, 0L),
      wire(12L, "zxqv wjkp qqzz vbnm xkcd plmo qwer asdf zxcv tyui ghjk bnmv", 1, 0L))
    runStream(s"$base/ckpt2", thr, first)
    val metaAfterFirst = graft.ext.Artifact.readMeta(spark, root)

    // consumer-group reset: a NEW checkpoint re-delivers the same
    // offset range plus one genuinely new record — at-least-once
    // transport, which admission must collapse to exactly-once
    val redelivered = first :+
      wire(14L, "a quiet fox rests near the bank while the quick dog jumps today", 1, 1L)
    val batches = runStream(s"$base/ckpt3", thr, redelivered)
    val s = batches.head._2
    assert(s.batchRows == 3)
    assert(s.rejectedQuality == 1, s"the soup doc re-fails the gate deterministically: $s")
    assert(s.ingest.replayed == 1, s"the re-delivered fluent doc is a replay: $s")
    assert(s.ingest.accepted == 1, s"the new offset's doc must land: $s")
    val ids = IncrementalIngest.corpus(spark, root)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L, 11L, 14L),
      s"exactly-once: re-delivery adds nothing, the new doc lands once: $ids")
    assert(graft.ext.Artifact.readMeta(spark, root) != metaAfterFirst,
      "the accepted new doc must advance the corpus fingerprint")
  }

  test("checkpoint replay: restarting the SAME checkpoint re-processes nothing") {
    val thr = setUp()
    val ckpt = s"$base/ckpt4"
    runStream(ckpt, thr,
      Seq(wire(11L, "the quick fox jumps near the river bank and the dog sleeps", 0, 0L)))
    val meta = graft.ext.Artifact.readMeta(spark, root)
    // same checkpoint, same (already-committed) data: AvailableNow
    // finds no new offsets and the batch hook never fires
    val batches = runStream(ckpt, thr,
      Seq(wire(11L, "the quick fox jumps near the river bank and the dog sleeps", 0, 0L)))
    assert(batches.isEmpty, s"a drained checkpoint must deliver no batches: $batches")
    assert(graft.ext.Artifact.readMeta(spark, root) == meta)
  }
}

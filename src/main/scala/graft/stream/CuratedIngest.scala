package graft.stream

import graft.ext.LanguageModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Quality-gated streaming admission — the composition a production
  * corpus actually runs: every incoming batch is scored against the
  * PERSISTED quality model before near-dup admission, so rare-token
  * soup is filtered at the door instead of polluting the corpus store
  * and band index ([[IncrementalIngest]] then applies its own
  * exactly-once + near-dup gates to the survivors).
  *
  * The gate is the CCNet perplexity filter served from the corpus's
  * unigram-LM artifact: reject documents whose mean NLL exceeds an
  * absolute threshold (chosen offline from the head/middle/tail
  * analysis — `quality_ppl_buckets`). Scoring cost is O(batch): the
  * batch's token stream against the BROADCAST vocabulary; the corpus
  * is never touched.
  *
  * Order matters and is deliberate: quality BEFORE dedup. The reverse
  * order would let a high-perplexity document reject its future
  * fluent near-duplicate and then be dropped itself — losing both.
  */
object CuratedIngest {

  /** [[IncrementalIngest.IngestStats]] plus the quality gate's count:
    * `batchRows = rejectedQuality + ingest.batchRows` by construction.
    */
  final case class CuratedStats(
      batchRows: Long,
      rejectedQuality: Long,
      ingest: IncrementalIngest.IngestStats)

  /** Admit one batch through the perplexity gate, then the full
    * [[IncrementalIngest.ingestBatch]] admission. `lmDir` must hold a
    * built unigram-LM artifact ([[LanguageModel.ensureLm]]); replaying
    * a batch is a no-op end to end (the gate is deterministic, and the
    * ingest layer's exactly-once admission handles the survivors).
    */
  def ingestBatch(spark: SparkSession, batch: DataFrame, root: String,
                  lmDir: String, maxMeanNll: Double,
                  vocabSize: Int = 4096,
                  minJaccard: Double = 0.35, maxBucket: Int = 64): CuratedStats = {
    val b = batch.select(col("doc_id"), col("text"))
      .dropDuplicates("doc_id").localCheckpoint()
    val batchRows = b.count()
    val keptIds = LanguageModel.score(spark, b, lmDir, vocabSize)
      .filter(col("mean_nll") <= maxMeanNll)
      .select(col("doc_id"))
    val kept = b.join(broadcast(keptIds), Seq("doc_id"), "left_semi")
      .localCheckpoint()
    val keptRows = kept.count()
    // the core directly: `kept` is already id-unique, two-column and
    // materialized — ingestBatch's own normalization would checkpoint
    // and count the same rows a second time on every replayed batch
    val stats = IncrementalIngest.ingestNormalized(spark, kept, keptRows,
      root, minJaccard, maxBucket)
    CuratedStats(batchRows, batchRows - keptRows, stats)
  }

  /** The streaming front end: any [[SourceConfig]] of `(doc_id, text)`
    * rows (for a [[KafkaWireSource]]/[[KafkaSourceConfig]], the decoded
    * JSON payload) → [[ingestBatch]] per micro-batch under a
    * checkpoint. Same delivery contract as
    * [[IncrementalIngest.start]]: `Trigger.AvailableNow` drains what
    * has arrived and stops; the checkpoint makes delivery
    * at-least-once, and the gate + admission chain is deterministic
    * and idempotent, so a re-delivered or replayed micro-batch is a
    * counted no-op — at-least-once transport becomes exactly-once
    * curated ingestion.
    */
  def start(spark: SparkSession, source: SourceConfig, checkpointDir: String,
            root: String, lmDir: String, maxMeanNll: Double,
            vocabSize: Int = 4096,
            minJaccard: Double = 0.35, maxBucket: Int = 64,
            onBatch: (Long, CuratedStats) => Unit = (_, _) => ()): StreamingQuery =
    StreamSources.open(spark, source)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty)
          onBatch(id, ingestBatch(spark, batch, root, lmDir, maxMeanNll,
            vocabSize, minJaccard, maxBucket))
      }
      .start()
}

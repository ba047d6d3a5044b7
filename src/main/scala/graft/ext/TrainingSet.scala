package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The OUTPUT end of a training-data pipeline: turn a curated corpus
  * into the thing a trainer actually consumes — documents packed into
  * fixed token budgets, domains re-weighted to a target mixture, and
  * the result exported as self-describing shards with manifests.
  *
  * Everything here is DETERMINISTIC (pure functions of doc_id and
  * text): a training set must be reproducible bit-for-bit from the
  * same corpus, and every assignment must be re-derivable for audit —
  * so no `rand()`, no partition-index dependence, no collect-order
  * dependence. Determinism is also what makes each operator
  * oracle-checkable in a second engine.
  *
  * Scale shapes (100 TB):
  *  - [[pack]] never does a global sort: documents are sharded by a
  *    pure key, and the prefix-sum window that assigns bins runs
  *    per-shard — one shuffle, each window partition is corpus/nShards.
  *  - [[mixture]] replicates via a bounded in-row `sequence` explode
  *    (no join against a copies table) and downsamples with a pure
  *    predicate pushed at the scan.
  *  - [[writeShards]] is one hash shuffle wide; manifests are computed
  *    from the same frame (no second corpus pass) and the export is an
  *    [[Artifact]]: fingerprint-guarded, rebuilt only when the corpus
  *    or the layout parameters change.
  */
object TrainingSet {

  /** Whitespace token count — [[TextAnalysis.tokens]]' cardinality, the
    * budget unit for packing (a real deployment would swap in a BPE
    * count; the dataflow is identical).
    */
  def tokenCount(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    size(TextAnalysis.tokens(text)).cast("long")

  /** Deterministic pseudo-shuffle key: a multiplicative hash small
    * enough to stay exact in any 64-bit engine (doc_id ≤ ~10¹³ keeps
    * doc_id·40503 < 2⁶³). Decorrelates storage order (doc_id is
    * usually insertion order — adjacent ids are same-source, same-day)
    * from training order without `rand()`, and is re-derivable anywhere
    * — including the DuckDB oracle, which engine-private hashes like
    * xxhash64 are not.
    */
  def shuffleKey(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (docId * lit(40503L)) % lit(65521L)

  /** Pack documents into fixed token budgets: each document lands in a
    * (shard, bin) such that every bin holds ~`budget` tokens of
    * pseudo-shuffled documents. Token-offset binning — bin =
    * floor(running-token-offset / budget) — is the scalable form of
    * greedy packing: the assignment is a per-shard prefix sum (one
    * window over a hash-sharded frame, NO global sort), whereas exact
    * first-fit packing is inherently sequential. Bins may overshoot the
    * budget by at most one document's tokens; trainers that need hard
    * caps truncate at read time.
    *
    * Output: (doc_id, shard, bin, n_tokens, token_offset) — offset is
    * the document's first token position within its shard's stream,
    * which is exactly what a sequence-packing loader needs to slice
    * without re-counting.
    */
  def pack(docs: DataFrame, budget: Long = 512L, nShards: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("sk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"),
        pmod(col("doc_id"), lit(nShards.toLong)).as("shard"),
        shuffleKey(col("doc_id")).as("sk"))
      .withColumn("token_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("shard"),
        (col("token_offset") / lit(budget)).cast("long").as("bin"),
        col("n_tokens"), col("token_offset"))
  }

  /** Re-weight domains to a target mixture: every document of domain d
    * appears `floor(weight(d))` times, plus once more for the
    * deterministic `frac(weight(d))` fraction of its domain (selected
    * by the pseudo-shuffle key, so the extra copies are spread across
    * the corpus, not a doc_id prefix). weight < 1 downsamples, > 1
    * upsamples — the standard Pile/ROOTS-style mixture table. Copies
    * are numbered so downstream packing/sharding can keep them apart.
    *
    * The explode is `sequence(1, n_copies)` on a row whose n_copies ≥ 1
    * — bounded by ⌈max weight⌉, never corpus-sized — and the n_copies=0
    * rows are dropped by a pushable filter before it.
    */
  def mixture(docs: DataFrame, weights: Map[String, Double],
              domainCol: String = "lang"): DataFrame = {
    val wCol = weights.foldLeft(lit(1.0)) { case (acc, (dom, wt)) =>
      when(col(domainCol) === dom, lit(wt)).otherwise(acc)
    }
    // the fractional copy goes to docs whose shuffle-key residue falls
    // below frac·65521 — exact integer threshold, no float comparison
    val thresh = (wCol - floor(wCol)) * lit(65521.0)
    docs
      .withColumn("n_copies",
        (floor(wCol).cast("long") +
          when(shuffleKey(col("doc_id")) < floor(thresh).cast("long"), 1L).otherwise(0L)))
      .filter(col("n_copies") >= 1L)
      .withColumn("copy", explode(sequence(lit(1L), col("n_copies"))))
      .drop("n_copies")
  }

  /** Contamination-safe train/holdout split. Assignment is pure id
    * arithmetic: documents whose [[shuffleKey]] residue falls below
    * `valPermille`/1000 of the key space become `validation`; the rest
    * are `train` EXCEPT documents near-duplicate to a validation doc
    * (≥ minJaccard in the persisted pair artifact,
    * [[Dedup.ensurePairs]]), which are labeled `leaked` — keeping them
    * in train would hand the model its own eval set, the classic
    * benchmark-contamination failure.
    *
    * Scale shape: the leaked set is derived from the PAIR TABLE alone
    * (a pair leaks iff exactly one side is validation — membership is a
    * pure function of the id, so no join against the corpus is needed
    * to find them); the corpus itself takes one broadcast anti-ish join
    * against that small set and never shuffles.
    */
  def holdoutSplit(spark: SparkSession, docs: DataFrame, pairDir: String,
                   valPermille: Int = 100, minJaccard: Double = 0.35): DataFrame = {
    require(valPermille > 0 && valPermille < 1000, s"valPermille in (0,1000): $valPermille")
    val valThresh = 65521L * valPermille / 1000L
    def isVal(id: org.apache.spark.sql.Column) = shuffleKey(id) < lit(valThresh)
    val leaked = Dedup.loadPairs(spark, pairDir, minJaccard)
      .filter(isVal(col("a_id")) =!= isVal(col("b_id")))
      .select(when(isVal(col("a_id")), col("b_id")).otherwise(col("a_id")).as("doc_id"))
      .distinct()
    docs
      .join(broadcast(leaked.withColumn("is_leaked", lit(true))), Seq("doc_id"), "left")
      .withColumn("split",
        when(isVal(col("doc_id")), "validation")
          .when(col("is_leaked"), "leaked")
          .otherwise("train"))
      .drop("is_leaked")
  }

  /** Export a corpus as training shards at rest, Artifact-guarded:
    *  - `shards/shard=K/` — one JSONL file per shard (the format
    *    trainers read), rows ordered by the pseudo-shuffle key.
    *  - `manifest/` — per shard: document count, token sum, and an
    *    order-independent content hash; what a loader checks before
    *    touching data, and what [[shardManifest]] serves.
    * One wide shuffle (the shard hash); the manifest aggregates the
    * same shuffled frame, so the corpus is read once. Returns the
    * artifact directory.
    */
  def writeShards(spark: SparkSession, docs: DataFrame, dir: String,
                  nShards: Int = 8): String = {
    val fp = Artifact.fingerprint(docs, col("doc_id"), col("text"))
    Artifact.ensure(spark, dir, s"shards v1 n=$nShards fp=$fp") {
      val assigned = docs
        .select(col("doc_id"), col("text"), col("lang"),
          pmod(col("doc_id"), lit(nShards.toLong)).as("shard"),
          shuffleKey(col("doc_id")).as("sk"))
        .repartition(nShards, col("shard"))
        .localCheckpoint() // feeds the JSONL write and the manifest
      assigned
        .sortWithinPartitions(col("shard"), col("sk"), col("doc_id"))
        .select(col("shard"),
          to_json(struct(col("doc_id"), col("text"), col("lang"))).as("value"))
        .write.partitionBy("shard").mode("overwrite").text(s"$dir/shards")
      assigned.groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(tokenCount(col("text"))).as("n_tokens"),
          sum(xxhash64(col("doc_id"), col("text"))).as("content_h"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/manifest")
    }
  }

  /** The manifest of a written export — what a training job validates
    * against before reading shard data.
    */
  def shardManifest(spark: SparkSession, dir: String): DataFrame = {
    Artifact.requireKind(spark, dir, "shards v1 ")
    spark.read.parquet(s"$dir/manifest")
  }

  /** Read one exported shard back in training order. */
  def readShard(spark: SparkSession, dir: String, shard: Int): DataFrame = {
    Artifact.requireKind(spark, dir, "shards v1 ")
    spark.read.schema("doc_id LONG, text STRING, lang STRING")
      .json(s"$dir/shards/shard=$shard")
  }
}

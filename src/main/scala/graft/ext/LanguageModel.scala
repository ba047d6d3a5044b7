package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-trained unigram language model for perplexity-based quality
  * filtering — the CCNet recipe (Wenzek et al. 2020: score each
  * document with a language model trained on the corpus, keep the
  * low-perplexity head) re-expressed as Spark aggregations instead of
  * an external KenLM binary. A unigram model keeps every statistic
  * oracle-reproducible while exercising the exact dataflow a
  * higher-order model needs: one token-count pass over the corpus, a
  * bounded heavy-hitter vocabulary, then per-document scoring against
  * the broadcast model.
  *
  * The trained model is a persisted artifact in the house pattern
  * ([[Artifact]]): the token-count ledger is built once per corpus
  * fingerprint, appended in O(batch) as the corpus grows, and shrunk
  * in O(removed) when documents are forgotten — counts are additive,
  * so both directions are delta writes, never a recount of history.
  * The vocabulary and smoothing constants are DERIVED at read time
  * from the ledger (top-V is a read parameter, not a build parameter),
  * so one stored model serves any vocabulary size.
  *
  * Scale shape at 100 TB: the count pass is one map-side-combinable
  * aggregation (distinct tokens per partition, not corpus tokens,
  * cross the shuffle); the vocabulary is a bounded
  * TakeOrderedAndProject over the ledger; scoring joins the exploded
  * token stream against the BROADCAST vocabulary and partially
  * aggregates per document — one row per document reaches the final
  * shuffle, the corpus-sized token stream never does.
  */
object LanguageModel {

  /** Unigram counts of a document frame — the model's sufficient
    * statistic. Map-side combine bounds shuffle volume by distinct
    * tokens per partition.
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))

  private[graft] val MetaPrefix = "unigramlm v2 "

  /** Build-if-needed unigram model over the corpus: the count ledger
    * plus a gen-stamped id ledger (append idempotency + removal
    * masking), guarded by the corpus content fingerprint. Returns the
    * artifact dir.
    */
  def ensureLm(spark: SparkSession, docs: DataFrame, dir: String): String =
    Artifact.ensure(spark, dir,
      // `unit=ws` names the tokenizer (whitespace): a swapped tokenizer
      // must read as a different model — and the parameter keeps the
      // line in the `<prefix> fp=` grammar the additive-append parser
      // expects (the prefix group is everything before " fp=")
      MetaPrefix + s"unit=ws fp=${Artifact.fingerprint(docs, col("doc_id"), col("text"))}") {
      tokenCounts(docs).write.mode("overwrite").parquet(s"$dir/counts")
      docs.select(col("doc_id"), lit(0L).as("gen"))
        .write.mode("overwrite").parquet(s"$dir/ids")
      // a fresh build has nothing logically deleted
      Artifact.clearTombstones(spark, dir)
      Artifact.writeNextGen(spark, dir, 1L)
    }

  /** The id ledger with logical deletes applied — the one definition of
    * "indexed" shared by the append anti-join (a removed doc must be
    * re-insertable) and the removal semi-join (only live docs can be
    * removed).
    */
  private def liveIds(spark: SparkSession, dir: String): DataFrame =
    Artifact.maskTombstones(spark, dir, spark.read.parquet(s"$dir/ids"))
      .select(col("doc_id"))

  /** Fold a document batch into the stored model in O(batch): counts
    * are additive, so the append is the batch's OWN count aggregate
    * written as ledger deltas — history is never recounted. Idempotent
    * via the id ledger (a double-submitted batch is a no-op); a doc
    * removed by [[removeLm]] is NOT treated as indexed, so re-insertion
    * works — its new id row's generation clears the tombstone's mask.
    * The additive fingerprint keeps a later [[ensureLm]] over the union
    * corpus serving without a rebuild. Crash-atomic under the pending
    * marker like the other append paths.
    */
  def appendLm(spark: SparkSession, batch: DataFrame, dir: String): Unit = {
    Artifact.requireKind(spark, dir, MetaPrefix)
    // an intra-batch duplicate id would double-count its tokens in the
    // ledger and bake two id rows into the additive fingerprint (the
    // idempotency anti-join only sees STORED ids) — fail fast, the same
    // contract as [[TrainingSet.appendShards]]
    if (batch.groupBy(col("doc_id")).count().filter(col("count") > 1).take(1).nonEmpty)
      throw new IllegalArgumentException(
        "LM append batch contains duplicate doc_ids — dedupe upstream first")
    val fresh = batch
      .join(broadcast(batch.select(col("doc_id"))
          .join(liveIds(spark, dir), Seq("doc_id"), "left_semi")),
        Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("text")).localCheckpoint()
    if (!fresh.isEmpty) {
      val gen = Artifact.readNextGen(spark, dir)
      Artifact.beginMutation(spark, dir)
      tokenCounts(fresh).write.mode("append").parquet(s"$dir/counts")
      fresh.select(col("doc_id"), lit(gen).as("gen"))
        .write.mode("append").parquet(s"$dir/ids")
      Artifact.writeNextGen(spark, dir, gen + 1L)
      Artifact.addToFingerprint(spark, dir, MetaPrefix,
        Artifact.fingerprint(fresh, col("doc_id"), col("text")))
      Artifact.endMutation(spark, dir)
    }
  }

  /** Delete documents from the stored model in O(removed) — the
    * [[Dedup.removeFromBandIndex]] analog, so the right-to-be-forgotten
    * lifecycle covers the LM artifact too:
    *  - the docs' token counts are corrected with NEGATIVE ledger
    *    deltas, recounted from their texts (deterministic — the caller
    *    passes the indexed text, the same contract as the band index's
    *    removal; history is never rescanned),
    *  - their id rows are masked via the shared `(doc_id, tgen)`
    *    tombstone set ([[Artifact.appendTombstones]]) until
    *    [[compactLm]] drops them physically,
    *  - the stored fingerprint is adjusted arithmetically, so a later
    *    [[ensureLm]] over the shrunken corpus SERVES instead of
    *    rebuilding.
    * [[vocab]] needs no masking at read: a fully-removed token nets to
    * a non-positive ledger sum and is excluded by the `c > 0` filter.
    */
  def removeLm(spark: SparkSession, removedDocs: DataFrame, dir: String): Unit = {
    Artifact.requireKind(spark, dir, MetaPrefix)
    val removed = removedDocs.select(col("doc_id"), col("text"))
      .join(broadcast(removedDocs.select(col("doc_id"))
          .join(liveIds(spark, dir), Seq("doc_id"), "left_semi")),
        Seq("doc_id"), "left_semi")
      .localCheckpoint()
    if (!removed.isEmpty) {
      Artifact.beginMutation(spark, dir)
      tokenCounts(removed).select(col("token"), (-col("c")).as("c"))
        .write.mode("append").parquet(s"$dir/counts")
      val tgen = Artifact.readNextGen(spark, dir)
      Artifact.appendTombstones(spark, dir,
        removed.select(col("doc_id"), lit(tgen).as("tgen")))
      Artifact.subtractFromFingerprint(spark, dir, MetaPrefix,
        Artifact.fingerprint(removed, col("doc_id"), col("text")))
      Artifact.endMutation(spark, dir)
    }
  }

  /** Compact the ledgers after a run of appends/removals: per-token
    * deltas merged back to one row and non-positive nets dropped
    * (consumer-equivalent — [[vocab]] filters `c > 0` at read), masked
    * id rows dropped and the tombstone set cleared, files re-sized.
    * Metadata untouched.
    */
  def compactLm(spark: SparkSession, dir: String): (Int, Int) = {
    val (b1, a1) = Artifact.compactParquet(spark, dir, "counts",
      merge = _.groupBy(col("token")).agg(sum(col("c")).as("c"))
        .filter(col("c") > 0))
    val idsMerge: DataFrame => DataFrame =
      if (!Artifact.hasTombstones(spark, dir)) identity
      else {
        val tombstones = Artifact.loadTombstones(spark, dir).localCheckpoint()
        _.join(broadcast(tombstones), Seq("doc_id"), "left")
          .filter(col("tgen").isNull || col("gen") >= col("tgen"))
          .drop("tgen")
      }
    val (b2, a2) = Artifact.compactParquet(spark, dir, "ids", merge = idsMerge)
    Artifact.clearTombstones(spark, dir)
    (b1 + b2, a1 + a2)
  }

  /** The model's serving form: top-`vocabSize` tokens by corpus count
    * (count-desc, token-asc — deterministic at the boundary), summed
    * over the delta ledger; tokens whose net count is non-positive
    * (fully removed) are excluded. Bounded output, safe to broadcast.
    */
  def vocab(spark: SparkSession, dir: String, vocabSize: Int): DataFrame = {
    Artifact.requireKind(spark, dir, MetaPrefix)
    spark.read.parquet(s"$dir/counts")
      .groupBy(col("token")).agg(sum(col("c")).as("c"))
      .filter(col("c") > 0)
      .orderBy(col("c").desc, col("token"))
      .limit(vocabSize)
  }

  /** Score documents against the stored model: per-document token
    * count, OOV count, and mean negative log-likelihood in nats
    * (rounded to 6 decimals — the house float-parity contract). Add-one
    * smoothing with a single OOV outcome: p(t ∈ vocab) = (c_t + 1) / D,
    * p(OOV) = 1 / D, D = Σ_vocab c + |vocab| + 1 — a proper
    * distribution (sums to exactly 1). Low mean_nll = fluent,
    * in-distribution text; high = rare-token soup — the CCNet quality
    * axis. The scored frame may be ANY document batch, not just the
    * training corpus: scoring new data against a frozen corpus model is
    * the production serving shape.
    */
  /** Session memo over the pinned serving vocab: every scoring call
    * (perplexity queries, DSIR's two models, the streaming quality
    * gate's per-micro-batch scoring) re-netted the count ledger — 3-4
    * driver actions per call over a bounded table that only changes
    * when the MODEL changes. Keyed by the artifact meta (the additive
    * fingerprint bumps on every append/remove, so a mutated model
    * re-nets) and the application id (a later session retrains rather
    * than serving state bound to a stopped context). Stale entries for
    * a mutated artifact are evicted and unpersisted by [[ServingMemo]].
    */
  private val vocabMemo =
    scala.collection.concurrent.TrieMap.empty[String, ServingMemo.Entry[DataFrame]]

  private def vocabCached(spark: SparkSession, dir: String,
                          vocabSize: Int): DataFrame =
    ServingMemo.cached(vocabMemo,
      s"${spark.sparkContext.applicationId}#$dir#$vocabSize",
      Artifact.readMeta(spark, dir).getOrElse("")) {
      val v = vocab(spark, dir, vocabSize).localCheckpoint()
      ServingMemo.Entry(v, Seq(v))
    }

  /** Pre-net the serving vocab into the session memo — called from the
    * warm phase so the first scoring query against each model measures
    * serve cost, not the one-time ledger netting.
    */
  def warmVocab(spark: SparkSession, dir: String, vocabSize: Int = 4096): Unit =
    vocabCached(spark, dir, vocabSize)

  def score(spark: SparkSession, docs: DataFrame, dir: String,
            vocabSize: Int = 4096): DataFrame = {
    // the vocab is read twice (smoothing constant + join side): pin the
    // bounded table once instead of re-running the ledger aggregate
    val v = vocabCached(spark, dir, vocabSize)
    val consts = v.agg((coalesce(sum(col("c")), lit(0L)) + count(lit(1)) + 1L).as("d"))
    docs.select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      .join(broadcast(v), Seq("token"), "left")
      .crossJoin(broadcast(consts))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("c").isNull, 1L).otherwise(0L)).as("n_oov"),
        round(sum(-log((coalesce(col("c"), lit(0L)) + 1L).cast("double") / col("d")))
          / count(lit(1)), 6).as("mean_nll"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document under a TARGET-domain model and under the RAW-corpus
    * model, and weight it by the per-token log-likelihood ratio —
    * here `log_ratio = mean_nll_raw − mean_nll_target` (positive =
    * looks more like the target domain than like the corpus average).
    * Selecting the top-weighted documents is the data-selection step
    * that upweights target-like data without training a classifier.
    *
    * Both models are persisted unigram artifacts served through
    * [[score]], each smoothed over its OWN top-`vocabSize` vocabulary
    * (the importance ratio is between the two models as estimated, the
    * DSIR formulation). Scale shape: two broadcast-vocab scoring
    * passes over the same exploded token stream + one join on doc_id —
    * one row per document per side crosses the shuffle.
    */
  def importanceWeights(spark: SparkSession, docs: DataFrame,
                        targetDir: String, rawDir: String,
                        vocabSize: Int = 4096): DataFrame = {
    val t = score(spark, docs, targetDir, vocabSize)
      .select(col("doc_id"), col("mean_nll").as("nll_target"))
    val r = score(spark, docs, rawDir, vocabSize)
      .select(col("doc_id"), col("mean_nll").as("nll_raw"))
    t.join(r, Seq("doc_id"))
      .select(col("doc_id"), col("nll_target"), col("nll_raw"),
        // both inputs are round-6 values, so the difference is exact
        // in both engines — no second rounding contract needed, but
        // round anyway to pin the boundary
        round(col("nll_raw") - col("nll_target"), 6).as("log_ratio"))
  }

  /** CCNet's head/middle/tail split: bucket documents by corpus
    * perplexity terciles. Thresholds come from one tiny exact-percentile
    * aggregate broadcast back (the [[TextAnalysis.qualityDecileBuckets]]
    * shape — no corpus sort, swaps to `approx_percentile` above memory);
    * assignment is a per-row comparison. The scored frame is computed
    * twice (threshold pass + assignment pass) — the standard
    * corpus-relative-threshold cost, same as the length-quantile floor.
    */
  def perplexityBuckets(scored: DataFrame): DataFrame = {
    val thr = scored.agg(
      expr("percentile(mean_nll, array(CAST(1 AS DOUBLE)/3, CAST(2 AS DOUBLE)/3))").as("t"))
    scored.crossJoin(broadcast(thr))
      .withColumn("ppl_bucket",
        when(col("mean_nll") <= col("t").getItem(0), "head")
          .when(col("mean_nll") <= col("t").getItem(1), "middle")
          .otherwise("tail"))
      .drop("t")
  }
}

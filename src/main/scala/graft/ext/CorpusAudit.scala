package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-audit reports: the monitoring tables a data-curation team
  * reads before anything trains — cross-source leakage, per-source
  * health, and embedding-space drift. The reference pipeline has no
  * monitoring layer at all (its only report is the CloudWatch job
  * status, /root/reference/README.md:63); these are the tables that
  * layer would publish, computed in-plan from the same corpus scan
  * the curation queries already make.
  *
  * Scale shapes, per report:
  *  - [[sourceOverlap]]: ONE shuffle keyed by shingle; everything
  *    after the exchange is bounded by the SOURCE DIMENSION, never the
  *    corpus (collect_set caps at |sources|, the pair explode at
  *    |sources| choose 2 per shingle).
  *  - [[sourceScorecard]]: one partial-aggregated groupBy(source) —
  *    the shuffle carries |sources| rows of integer sums.
  *  - [[embedDriftMeans]]: one posexplode pass partial-aggregated to
  *    64 cells before the exchange (the Pca.meansPass shape, in-plan).
  */
object CorpusAudit {

  /** Cross-source contamination matrix: for each unordered source
    * pair, how many distinct w-gram shingles the two sources share.
    * This is the "who overlaps whom" audit run before mixing sources
    * into one training corpus — a pair with heavy shingle overlap
    * either shares an upstream crawl or copies text, and its mixture
    * weight double-counts that content.
    *
    * Dataflow: explode shingles, groupBy(shingle) with a map-side-
    * combined collect_set(source) — the only corpus-sized exchange,
    * and its payload is source-set fragments, not text. Multi-source
    * shingles (the rare survivors) explode into ordered pairs from
    * their sorted source set; a terminal dimension-sized count
    * finishes. A shingle present in EVERY source costs
    * |sources|²/2 pair rows — bounded by the source dimension, so no
    * skew guard is needed (contrast Dedup.minhashPairs' maxBucket,
    * where the bucket population is corpus-sized).
    */
  /** Token-slice gram rows for [[sourceOverlap]]: (source, toks, pos,
    * hk) with hk = xxhash64 over the w-token slice. Gram construction
    * stays OUTSIDE higher-order-function lambdas (the
    * winnowFingerprints lesson: expressions inside `transform` evaluate
    * interpreted; this explode-then-join shape keeps the array_join in
    * a WholeStageCodegen projection). Short-doc edge matches
    * Dedup.shingles: one whole-doc shingle. Null texts drop here:
    * Spark would otherwise hash a null slice to the seed value and
    * join a null shingle string, registering a spurious cross-source
    * "shared" gram; the oracle's unnest(NULL) emits nothing, so both
    * engines must see null docs vanish.
    */
  private def gramKeys(df: DataFrame, w: Int): DataFrame = df
    .filter(col("text").isNotNull)
    .select(col("source"), split(col("text"), " ").as("toks"))
    .select(col("source"), col("toks"),
      explode(sequence(lit(1),
        greatest(size(col("toks")) - lit(w - 1), lit(1)))).as("pos"))
    .select(col("source"), col("toks"), col("pos"),
      xxhash64(slice(col("toks"), col("pos"), lit(w))).as("hk"))

  /** The corpus-sized candidate pass of [[sourceOverlap]], exposed so
    * its physical plan is pinnable in isolation (CorpusAuditSpec): it
    * groups on an 8-byte gram hash — no shingle STRING is ever built
    * or shuffled here (the key is xxhash64 over the token slice,
    * computed in codegen), and dense integer source ids
    * (dimension-sized; single-partition window is fine there) ride
    * along broadcast so the multi-source test is min(sid) != max(sid):
    * primitive agg buffers keep the corpus-sized groupBy in codegen'd
    * HashAggregateExec. A collect_set here instead would plan
    * ObjectHashAggregate, whose sort-based fallback effectively SORTS
    * the shingle stream once the map passes the fallback threshold —
    * measured 161 s vs 30 s at the 100× point. Hash collisions only
    * ADD candidates (a colliding pair of single-source grams looks
    * multi-source); the exact string-keyed second stage filters them,
    * so the result is collision-proof.
    */
  private[ext] def overlapCandidates(docs: DataFrame, w: Int = 8): DataFrame = {
    // hash-stable source id, not row_number over a global window: the
    // partitionless window serializes the (dimension-sized) source
    // table through ONE task and warns on every run; xxhash64 gives a
    // deterministic distinct id with no sort and no single-partition
    // stage. The id only feeds the min≠max multi-source test — a
    // 64-bit collision between two of a corpus's handful of sources
    // (~1e-19 at 10⁴ sources) could only DROP a candidate, and the
    // exact string-keyed second stage never sees it; candidates remain
    // collision-proof in the ADD direction as before.
    val sids = docs.select(col("source")).distinct()
      .withColumn("sid", xxhash64(col("source")))
    gramKeys(docs, w)
      .join(broadcast(sids), Seq("source"))
      .groupBy(col("hk"))
      .agg(min(col("sid")).as("lo"), max(col("sid")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .select(col("hk"))
  }

  /** `maxBroadcastCandidates`: max candidate rows to broadcast in the
    * semi-join below. Negative (the default) auto-derives the cap from
    * the actual heap; `0` keeps its natural meaning — never broadcast,
    * always the shuffle-hash fallback.
    */
  def sourceOverlap(docs: DataFrame, w: Int = 8,
                    maxBroadcastCandidates: Long = -1L): DataFrame = {
    // The expensive set aggregation runs only on the multi-source
    // survivors — bounded by the TRUE cross-source overlap (the
    // audit's own signal), not the corpus. The semi-join is HINTED
    // broadcast (8 bytes per candidate hash): left to AQE it
    // graduates to a sort-merge join whose exchange would carry the
    // full token arrays riding each gram row — measured 133 s vs 30 s
    // at the 100× point. Shingle strings are built AFTER the in-stage
    // filter, for candidate rows only.
    //
    // Candidate-volume guard: the candidate set is data-dependent — a
    // corpus whose sources heavily overlap (mirrored crawls, exactly
    // the contamination this audit detects) produces a corpus-sized
    // candidate set that would blow the driver broadcast limit and
    // fail the audit precisely in its alarm regime. So the candidates
    // are materialized once (localCheckpoint — executor-resident, not
    // driver), counted, and above `maxBroadcastCandidates` the
    // semi-join falls back to a shuffle-hash join: the audit degrades
    // to slow instead of failing. The default threshold derives from
    // the driver/executor heap (maxMemory/64 at ~32 bytes per built
    // broadcast-hash-map entry, clamped to [4M, 64M] rows): the 8 GB
    // broadcast hard cap is NOT the binding limit — a default-sized
    // driver OOMs building a 64M-row relation well before it (r9
    // advice), so the guard has to track the heap actually present.
    val cand = overlapCandidates(docs, w).localCheckpoint(false) // lazy: count() below materializes
    // Sentinel: negative = auto-derive from heap; 0 and positive are
    // taken literally (0 = never broadcast) — overloading 0 as the
    // auto sentinel would silently re-enable broadcasting for a caller
    // that asked to disable it (r10 advice).
    val maxCand =
      if (maxBroadcastCandidates >= 0L) maxBroadcastCandidates
      else math.max(4L * 1024 * 1024,
        math.min(64L * 1024 * 1024, Runtime.getRuntime.maxMemory / 64 / 32))
    val semiRight =
      if (cand.count() <= maxCand) broadcast(cand)
      else cand.hint("shuffle_hash")
    val multi = gramKeys(docs, w)
      .join(semiRight, Seq("hk"), "left_semi")
      .select(col("source"),
        array_join(slice(col("toks"), col("pos"), lit(w)), " ").as("sh"))
      .groupBy(col("sh"))
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .filter(size(col("srcs")) > 1)
    multi
      .select(posexplode(col("srcs")).as(Seq("i", "src_a")), col("srcs"))
      .select(col("src_a"),
        explode(slice(col("srcs"), col("i") + 2,
          size(col("srcs")) - col("i") - 1)).as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Per-source health scorecard: document and token volume, distinct
    * text count (dup_rate = the fraction a whole-doc dedup would
    * remove), and mean document length. The per-source row a corpus
    * dashboard plots over time.
    *
    * Determinism: counts are exact integers; avg_tokens and dup_rate
    * are ONE double division of exact integers (the Tables.davg
    * discipline — no terminal round, both engines produce the
    * identical IEEE-754 quotient). countDistinct rides the same
    * hash-agg; at 100 TB the distinct-text count swaps for
    * approx_count_distinct's fixed-memory sketch (the documented
    * A1/a9 trade) while the rest of the row is unchanged.
    */
  def sourceScorecard(docs: DataFrame): DataFrame =
    docs
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_distinct_texts"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .select(col("source"), col("n_docs"), col("n_distinct_texts"),
        col("n_tokens"),
        (col("n_tokens").cast("double") / col("n_docs")).as("avg_tokens"),
        ((col("n_docs") - col("n_distinct_texts")).cast("double") /
          col("n_docs")).as("dup_rate"))
      .orderBy(col("source"))

  /** Embedding-space drift between two corpus snapshots (even/odd
    * vec_id halves, the corpus_drift_kl convention): per-dimension
    * means of both halves and their shift. Token-KL drift
    * (TextAnalysis.tokenDriftKl) sees vocabulary change; this sees
    * REPRESENTATION change — the embedding-model-rot signal that
    * pages before an index rebuild is due.
    *
    * Cross-engine contract: per-cell sums are exact integer
    * micro-units (the Pca.meansPass discipline — float → double →
    * decimal(18,6) → ×1e6 integer), the mean is one double division
    * of exact integers, and delta subtracts two identical doubles, so
    * every cell hash-verifies with no terminal round at all. The
    * partial aggregation collapses the explode to 64 cells per
    * partition before the exchange.
    */
  def embedDriftMeans(emb: DataFrame, dims: Int = 64): DataFrame = {
    val xu = (col("xi").cast("double").cast("decimal(18,6)") * lit(1000000L))
      .cast("decimal(20,0)")
    val isNew = pmod(col("vec_id"), lit(2)) === 1
    emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "xi")))
      // `dims` bounds the report to the leading dimensions (and is the
      // oracle contract: the registered query's DuckDB twin hard-codes
      // generate_series over exactly `dims`=64 cells — a wider
      // embedding would silently diverge without this filter).
      .filter(col("i") < lit(dims))
      .groupBy(col("i"))
      .agg(
        sum(when(!isNew, xu)).cast("decimal(38,0)").as("sx_old"),
        sum(when(isNew, xu)).cast("decimal(38,0)").as("sx_new"),
        sum(when(!isNew, 1L).otherwise(0L)).as("n_old"),
        sum(when(isNew, 1L).otherwise(0L)).as("n_new"))
      .select(col("i"), col("n_old"), col("n_new"),
        (col("sx_old").cast("double") /
          (col("n_old").cast("double") * lit(1000000.0))).as("mean_old"),
        (col("sx_new").cast("double") /
          (col("n_new").cast("double") * lit(1000000.0))).as("mean_new"))
      .withColumn("delta", col("mean_new") - col("mean_old"))
      .orderBy(col("i"))
  }
}

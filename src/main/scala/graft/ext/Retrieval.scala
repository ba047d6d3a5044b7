package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid (sparse + dense) retrieval: fuse a BM25 ranked list from the
  * persisted inverted index with a dense cosine ranked list over the
  * embedding table via Reciprocal Rank Fusion (Cormack/Clarke/Buettcher,
  * SIGIR 2009 — PAPERS.md): `score(d) = Σ_lists 1/(c + rank_list(d))`.
  *
  * RRF is the standard fusion for LLM retrieval stacks (lexical recall +
  * semantic recall without score calibration) and is exactly what a
  * training-data curation pipeline runs to pull candidate documents for
  * a topic: ranks are integers, so unlike score interpolation the fusion
  * is scale-free and — under the house float-parity contract — exactly
  * DuckDB-reproducible (1/(c+r) in double, one pinned addition order,
  * round-6 at the end).
  *
  * Scale shape: both input lists are ALREADY top-k bounded (≤ k rows
  * each, k ~ tens), so the rank windows and the full-outer fusion join
  * run on driver-sized data no matter the corpus size; the expensive
  * work (index probe, ANN scan) stays in the two upstream operators,
  * each of which is partition-pruned/broadcast-shaped on its own.
  */
object Retrieval {

  /** Attach 1-based ranks to a bounded ranked list. `ord` must be the
    * list's own deterministic order (e.g. score desc, id asc). The
    * single-partition window is safe ONLY for top-k bounded inputs, so
    * the contract is ENFORCED at runtime, not just documented: the list
    * is snapshotted (one evaluation — the guard count and the ranking
    * both read the snapshot) and a `require` fails loudly past
    * `maxRows` instead of silently serializing an unbounded rank onto
    * one task. The rank itself uses NO window operator: the bounded
    * list is `repartition(1)` + in-partition sort, and
    * `monotonically_increasing_id` is exactly the partition-local row
    * index when there is one partition — same result as an
    * unpartitioned `row_number`, without `WindowExec`'s `No Partition
    * Defined` warning spam in the bench tail (which would mask a REAL
    * unpartitioned window someday; a constant `partitionBy` literal
    * doesn't help — the optimizer folds it away).
    */
  private def ranked(list: DataFrame, idCol: String, ord: Seq[Column],
                     maxRows: Int): DataFrame = {
    val snap = list.localCheckpoint()
    val n = snap.count()
    require(n <= maxRows,
      s"Retrieval.ranked input has $n rows (> bound $maxRows): a global rank " +
        "window on unbounded input would serialize one task at corpus scale — " +
        "apply the top-k bound upstream")
    snap.repartition(1).sortWithinPartitions(ord: _*)
      .withColumn("rank", monotonically_increasing_id() + 1)
      .select(col(idCol).as("doc_id"), col("rank").cast("long"))
  }

  /** RRF-fuse a sparse and a dense top-k list into one ranked table.
    *
    * @param sparse BM25 list with columns (doc_id, n_terms, score) in
    *               [[InvertedIndex.searchBm25]]'s order contract
    * @param dense  cosine list with columns (q_id, rank, n_id, n_label,
    *               cos) from [[Similarity.bruteForceTopK]] (single query)
    * @param k       fused rows to keep
    * @param c       RRF constant (60 per the paper)
    * @param maxList hard ceiling on the sparse list size (bounded-input
    *                contract, enforced in [[ranked]]); generous vs any
    *                top-k usage, loud when a caller forgets the bound
    * @return (doc_id, r_sparse, r_dense, rrf_score) ordered
    *         rrf-desc, doc_id-asc; absent-from-one-list ranks are null
    */
  def rrfFuse(sparse: DataFrame, dense: DataFrame, k: Int, c: Int = 60,
              maxList: Int = 1000): DataFrame = {
    val s = ranked(sparse, "doc_id", Seq(col("score").desc, col("doc_id").asc),
        maxList)
      .withColumnRenamed("rank", "r_sparse")
    val dn = dense.select(col("n_id").as("doc_id"), col("rank").cast("long").as("r_dense"))
    s.join(dn, Seq("doc_id"), "full_outer")
      .withColumn("rrf_score", round(
        coalesce(lit(1.0) / (lit(c) + col("r_sparse")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("r_dense")), lit(0.0)), 6))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** End-to-end hybrid search over one (text query, query vector) pair:
    * BM25 from the persisted index + brute-force cosine for the single
    * query id, RRF-fused. The dense side broadcasts the one query row;
    * the corpus never shuffles.
    */
  def hybridSearch(spark: SparkSession, indexDir: String, textQuery: String,
                   emb: DataFrame, queryVecId: Long, perList: Int, k: Int,
                   c: Int = 60): DataFrame = {
    val sparse = InvertedIndex.searchBm25(spark, indexDir, textQuery, perList)
    val dense = Similarity.bruteForceTopKFor(emb,
      emb.filter(col("vec_id") === queryVecId), k = perList)
    rrfFuse(sparse, dense, k, c)
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over the token stream (Cormode & Muthukrishnan
  * 2005) next to its exact heavy-hitter baseline — the
  * bounded-memory frequency layer a 100 TB corpus needs when the
  * vocabulary no longer fits a groupBy (the sketch is d·w cells no
  * matter how many distinct terms flow through it).
  *
  * Shape: the sketch build is one map + partial-aggregated reduce —
  * map-side combine collapses every partition to ≤ d·w cells before
  * the exchange, so the shuffle is O(d·w · partitions), independent of
  * corpus size. Estimation probes the finished sketch with the d
  * bucket keys of each query term; the sketch (d·w rows) is broadcast,
  * the probe never shuffles.
  *
  * Determinism: bucket i of a term is two hex chars of md5(term) —
  * md5 is identical across engines, the hex-pair parse is integer
  * arithmetic, counts are exact longs. The oracle replays the sketch
  * cell-for-cell, so even the ESTIMATES hash-match (CMS is
  * deterministic given the hash family; only its error is
  * probabilistic over corpora).
  */
object Sketches {

  /** Bucket index for hash row `i` from an ALREADY-computed md5 hex
    * column: chars (2i+1, 2i+2) parsed as one byte → 0..255. Rows use
    * disjoint md5 bytes, the standard cheap stand-in for d independent
    * hashes. This compositional form is what the DuckDB oracle
    * replays; the HOT path uses [[graft.functions.native.cms_buckets]]
    * — one digest + byte-mask loop per token instead of d (substring +
    * base-conv) sub-trees, the same native-kernel treatment the
    * SRP/PQ families got after the compositional trees hit HotSpot
    * huge-method no-compile fallbacks at the 100× point. Bit-identical
    * by construction (bucket i IS md5 byte i); `SketchesSpec` pins the
    * parity. Kept package-visible for that spec.
    */
  private[ext] def bucketOf(hex: Column, i: Int): Column =
    conv(substring(hex, 2 * i + 1, 2), 16, 10).cast("long")

  /** The compositional (md5-hex) bucket array — the oracle-shaped twin
    * of the native kernel, used only by the parity spec.
    */
  private[graft] def bucketsHex(term: Column, d: Int): Column =
    array((0 until d).map(i => bucketOf(md5(term), i)): _*)

  /** Token stream of the corpus (one row per occurrence). */
  def tokenStream(docs: DataFrame): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col("text"))).as("term"))

  /** The d×w sketch as a table (row_i, bucket, c). */
  def cmsBuild(toks: DataFrame, d: Int = 4): DataFrame =
    toks
      .select(posexplode(graft.functions.native.cms_buckets(col("term"), d))
        .as(Seq("row_i", "bucket")))
      .groupBy(col("row_i"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Exact global heavy hitters: top-k terms by occurrence count,
    * (count DESC, term ASC) at the boundary.
    */
  def heavyHitters(toks: DataFrame, k: Int): DataFrame =
    toks.groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term").asc)
      .limit(k)

  /** CMS estimates for the exact top-k terms: est = min over the d
    * probed cells; `overest = n_est - n_exact >= 0` always (CMS never
    * underestimates a point query).
    */
  def cmsEstimateTopK(docs: DataFrame, k: Int, d: Int = 4): DataFrame = {
    val toks = tokenStream(docs)
    val sketch = cmsBuild(toks, d)
    val probes = heavyHitters(toks, k)
      .select(col("term"), col("n").as("n_exact"),
        posexplode(graft.functions.native.cms_buckets(col("term"), d))
          .as(Seq("row_i", "bucket")))
    probes.join(broadcast(sketch), Seq("row_i", "bucket"))
      .groupBy(col("term"), col("n_exact"))
      .agg(min(col("c")).as("n_est"))
      .select(col("term"), col("n_exact"), col("n_est"),
        (col("n_est") - col("n_exact")).as("overest"))
      .orderBy(col("n_exact").desc, col("term").asc)
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table — the core of a
  * training-data pipeline at 100 TB.
  *
  * Design for scale:
  *  - Exact dedup is a hash-groupBy on a 256-bit content hash: one
  *    shuffle keyed by the hash, no full-text comparison after the first
  *    aggregation (hash collisions at 2^-128 are accepted, as in
  *    production dedup systems).
  *  - MinHash/LSH: shingle → k min-hashes → band buckets → candidate
  *    pairs only *within* buckets. The all-pairs O(n²) comparison never
  *    materializes; the only shuffle is groupBy(band-key), and skewed
  *    buckets are capped (see `maxBucket`) — the standard guard against
  *    a degenerate band exploding a join at scale.
  *  - SimHash: 64-bit signature per doc computed in one narrow pass with
  *    higher-order functions (no explode → no shuffle), then pigeonhole
  *    banding on 16-bit chunks for Hamming-≤3 candidate pairs.
  */
object Dedup {

  /** Exact dedup: content-hash groupBy keeping the smallest doc_id — the
    * survivor rule is deterministic so results are stable across runs.
    */
  def exact(docs: DataFrame): DataFrame =
    docs.select(sha2(col("text"), 256).as("content_hash"), col("doc_id"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** w-word shingles of the whitespace-tokenized text (distinct set). */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = split(text, " ")
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - lit(w - 1), lit(1))),
      i => array_join(slice(toks, i, lit(w)), " ")))
  }

  /** MinHash signature: k min-hashes over the shingle set, computed in
    * one pass by the native [[graft.functions.MinHashSignature]]
    * expression (Kirsch-Mitzenmacher: 2 hashes/shingle instead of k).
    */
  def minhashSignature(shingleCol: Column, k: Int = 16): Column =
    graft.functions.native.minhash_sig(shingleCol, k)

  /** MinHash + LSH candidate pairs with exact-Jaccard verification.
    *
    * @param bands   LSH bands (k/bands rows per band); P(bucket-collide)
    *                = 1-(1-j^r)^b — 16 hashes in 8 bands of 2 targets
    *                recall at moderate jaccard.
    * @param minJaccard exact-Jaccard verification threshold on candidates.
    * @param maxBucket  skew guard: buckets larger than this are dropped
    *                   (a bucket of size m yields m² pairs — at 100 TB a
    *                   degenerate band key would otherwise dominate).
    */
  def minhashPairs(docs: DataFrame, k: Int = 16, bands: Int = 8,
                   minJaccard: Double = 0.15, maxBucket: Int = 64): DataFrame = {
    val r = k / bands
    val sig = docs
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .withColumn("sig", minhashSignature(col("sh")))
    val banded = sig.select(col("doc_id"), col("sh"),
      posexplode(array((0 until bands).map(b =>
        xxhash64((lit(b) +: (0 until r).map(i => col("sig")(b * r + i))): _*)): _*))
        .as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"),
      col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = banded.select(col("band"), col("bucket"),
      col("doc_id").as("b_id"), col("sh").as("b_sh"))
    val bucketSizes = banded.groupBy(col("band"), col("bucket")).count()
      .filter(col("count") <= maxBucket).drop("count")
    a.join(bucketSizes, Seq("band", "bucket"))
      .join(b, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("jaccard",
        size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          size(array_union(col("a_sh"), col("b_sh"))))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .distinct()
  }

  /** SimHash 64-bit signature: per bit, majority vote of token-hash
    * bits. Token hashing stays in codegen'd `xxhash64`; the 64-bit vote
    * runs in the native [[graft.functions.SimHash64]] expression (a
    * tight per-row loop — the higher-order-function formulation walked
    * an expression tree per token·bit and was ~40× slower).
    */
  def simhash(text: Column): Column =
    graft.functions.native.simhash64(transform(split(text, " "), t => xxhash64(t)))

  /** SimHash near-dup pairs: pigeonhole on four 16-bit chunks (any pair
    * within Hamming distance 3 must agree on ≥1 chunk), verify with
    * bit_count(xor) ≤ maxHamming. Join key is (chunk-index, chunk-value)
    * — candidates only, never all-pairs.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col("doc_id"), simhash(col("text")).as("sig"))
    val chunked = sigs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sig"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk_idx", "chunk")))
    val a = chunked.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("a_id"), col("sig").as("a_sig"))
    val b = chunked.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("b_id"), col("sig").as("b_sig"))
    a.join(b, Seq("chunk_idx", "chunk"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("hamming", bit_count(col("a_sig").bitwiseXOR(col("b_sig"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .distinct()
  }

  /** N-gram Jaccard top-K most-similar pairs. For bench-sized inputs the
    * candidate set comes from LSH banding (above); this variant returns
    * the K highest-Jaccard candidate pairs so results are non-empty even
    * on corpora with no true near-dups.
    */
  def topJaccardPairs(docs: DataFrame, topK: Int = 25): DataFrame = {
    val pairs = minhashPairs(docs, minJaccard = 0.0)
    pairs
      .withColumn("rn", row_number().over(
        Window.orderBy(col("jaccard").desc, col("a_id").asc, col("b_id").asc)))
      .filter(col("rn") <= topK)
      .drop("rn")
  }
}

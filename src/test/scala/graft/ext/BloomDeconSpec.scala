package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BloomDeconSpec extends SparkSuite {
  import spark.implicits._

  // corpus docs 1-4; doc 2 copies a benchmark 5-gram verbatim, doc 4
  // shares nothing. benchmark = docs 90/91.
  private def corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "intro words then the secret eval answer phrase here trailing"),
    (3L, "totally unrelated content about shuffle partitions and exchanges"),
    (4L, "more clean text with no overlap against anything benchmarked")
  ).toDF("doc_id", "text")

  private def bench = Seq(
    (90L, "the secret eval answer phrase appears in this benchmark row"),
    (91L, "another benchmark document with its own distinctive wording")
  ).toDF("doc_id", "text")

  test("generously sized sketch equals the exact path") {
    val exact = Dedup.removeContaminated(corpus, bench)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val bloom = Dedup.removeContaminatedBloom(corpus, bench)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(exact == Seq(1L, 3L, 4L), "doc 2 carries a benchmark 5-gram")
    assert(bloom == exact)
  }

  test("no false negatives at ANY size: bloom removal is a superset of exact") {
    // 64 bits for ~20 shingles: false positives guaranteed, but every
    // truly contaminated doc must still be removed — the safe direction.
    val bloomKept = Dedup.removeContaminatedBloom(corpus, bench,
        expectedItems = 4L, numBits = 64L)
      .select("doc_id").as[Long].collect().toSet
    val exactKept = Dedup.removeContaminated(corpus, bench)
      .select("doc_id").as[Long].collect().toSet
    assert(bloomKept.subsetOf(exactKept),
      s"bloom may only over-remove: kept $bloomKept vs exact $exactKept")
    assert(!bloomKept.contains(2L), "contaminated doc must never survive")
  }

  test("sketch size is fixed by numBits, independent of input cardinality") {
    val small = Dedup.benchmarkSketch(bench.limit(1), numBits = 1L << 16)
    val large = Dedup.benchmarkSketch(
      bench.unionByName(corpus.withColumn("doc_id", col("doc_id") + 100L)),
      numBits = 1L << 16)
    assert(small.length == large.length,
      s"serialized size must be the configured constant (${small.length} vs ${large.length})")
  }

  test("empty benchmark removes nothing") {
    val out = Dedup.removeContaminatedBloom(corpus, bench.filter(col("doc_id") < 0L))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 2L, 3L, 4L))
  }

  test("sketch build is deterministic: same input, same bytes") {
    val a = Dedup.benchmarkSketch(bench)
    val b = Dedup.benchmarkSketch(bench)
    assert(java.util.Arrays.equals(a, b))
  }

  test("adaptive sizing: >= 14 bits/item, power of two, 1 MiB floor") {
    // tiny benchmarks sit on the floor
    assert(Dedup.adaptiveBloomBits(1L) == (1L << 23))
    assert(Dedup.adaptiveBloomBits(100000L) == (1L << 23))
    // the r13 saturation case: ~5M items must get >= 14 bits each (the
    // fixed 1 MiB default gave 1.6 and rejected 99.7% of the corpus)
    val bits5M = Dedup.adaptiveBloomBits(5000000L)
    assert(bits5M >= 14L * 5000000L)
    assert(java.lang.Long.bitCount(bits5M) == 1, s"power of two: $bits5M")
    // round-up never exceeds 2x the 14-bits/item target
    assert(bits5M < 28L * 5000000L)
  }

  test("adaptive sketch keeps the one-sided error contract") {
    // the streaming gate's sizing path, batch twin: removal through the
    // adaptively-sized sketch must be a superset of exact removal (kept
    // is a subset of exact kept), whatever size the measurement picks —
    // this is the GUARANTEED relation; equality to the exact oracle at
    // the gated fixture scales is empirical (zero FPs observed), which
    // the oracle note on stream_decon_corpus declares.
    val sk = Dedup.adaptiveBenchmarkSketch(bench)
    assert(sk != null)
    val kept = corpus.filter(!exists(Dedup.shingleHashes(col("text"), 5),
        h => graft.functions.native.bloom_might_contain(sk, h)))
      .select("doc_id").as[Long].collect().toSet
    val exactKept = Dedup.removeContaminated(corpus, bench)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.subsetOf(exactKept))
    assert(!kept.contains(2L), "contaminated doc must never survive")
  }
}

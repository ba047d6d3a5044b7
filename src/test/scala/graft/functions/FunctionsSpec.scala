package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Edge-case behavior of the native expressions (both eval paths: the
  * interpreted nullSafeEval and, where parents allow it, codegen).
  */
class FunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("cosine_sim: null-intolerant, zero-norm safe, double arrays supported") {
    val df = Seq(
      (Some(Array(1.0f, 0.0f)), Some(Array(1.0f, 0.0f))),
      (None, Some(Array(1.0f, 0.0f)))
    ).toDF("a", "b")
    val out = df.select(native.cosine_sim(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 1.0)
    assert(out(1).isNullAt(0))

    val zero = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
      .select(native.cosine_sim(col("a"), col("b"))).head()
    assert(zero.getDouble(0) == 0.0)

    val dbl = Seq((Array(3.0, 4.0), Array(3.0, 4.0))).toDF("a", "b")
      .select(native.cosine_sim(col("a"), col("b"))).head()
    assert(math.abs(dbl.getDouble(0) - 1.0) < 1e-12)
  }

  test("dot_product: exact sums, null-intolerant, mixed float/double") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f, 3.0f)), Some(Array(4.0f, 5.0f, 6.0f))), // 32
      (None, Some(Array(1.0f)))
    ).toDF("a", "b")
    val out = df.select(native.dot_product(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 32.0)
    assert(out(1).isNullAt(0))

    val mixed = Seq((Array(0.5, 0.25), Array(0.5, 0.25))).toDF("a", "b")
      .select(native.dot_product(col("a"), col("b"))).head()
    assert(mixed.getDouble(0) == 0.3125)

    // SQL registration path
    native.registerAll(spark)
    assert(spark.sql("SELECT dot_product(array(1.0F,2.0F), array(3.0F,4.0F))")
      .head().getDouble(0) == 11.0)
  }

  test("cosine_sim: type check rejects non-numeric arrays") {
    val df = Seq((Array("x"), Array("y"))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(native.cosine_sim(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("cosine_sim"))
  }

  test("jaccard_sim: duplicates collapse to set semantics; empty sets") {
    val df = Seq(
      (Array("a", "a", "b"), Array("b", "b", "c")),   // sets {a,b},{b,c} → 1/3
      (Array.empty[String], Array.empty[String]),      // ∅ vs ∅ → 1.0
      (Array("a"), Array.empty[String])                // → 0.0
    ).toDF("a", "b")
    val out = df.select(native.jaccard_sim(col("a"), col("b"))).collect()
    assert(math.abs(out(0).getDouble(0) - 1.0 / 3) < 1e-12)
    assert(out(1).getDouble(0) == 1.0)
    assert(out(2).getDouble(0) == 0.0)
  }

  test("jaccard_sim over array<long>: set semantics match the string form") {
    val df = Seq(
      (Array(1L, 1L, 2L), Array(2L, 2L, 3L)),        // {1,2},{2,3} → 1/3
      (Array.empty[Long], Array.empty[Long]),         // ∅ vs ∅ → 1.0
      (Array(7L), Array.empty[Long])                  // → 0.0
    ).toDF("a", "b")
    val out = df.select(native.jaccard_sim(col("a"), col("b"))).collect()
    assert(math.abs(out(0).getDouble(0) - 1.0 / 3) < 1e-12)
    assert(out(1).getDouble(0) == 1.0)
    assert(out(2).getDouble(0) == 0.0)
    // mixed element types are rejected, not silently coerced
    val bad = Seq((Array("x"), Array(1L))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(native.jaccard_sim(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("jaccard_sim"))
  }

  test("minhash_sig over array<long>: length k, deterministic, monotone") {
    val df = Seq((Array(10L, 20L), Array(10L, 20L, 30L))).toDF("small", "big")
    val row = df.select(native.minhash_sig(col("small"), 8).as("s"),
      native.minhash_sig(col("big"), 8).as("b")).head()
    val s = row.getSeq[Long](0); val b = row.getSeq[Long](1)
    assert(s.length == 8 && b.length == 8)
    assert(s.zip(b).forall { case (x, y) => y <= x })
    // same input → same signature (pure function of the element values)
    val again = df.select(native.minhash_sig(col("small"), 8)).head().getSeq[Long](0)
    assert(again == s)
  }

  test("simhash64: empty token list → 0; single hash reproduces its bits") {
    val df = Seq(
      (1L, Array.empty[Long]),
      (2L, Array(0x0F0F0F0F0F0F0F0FL))
    ).toDF("id", "hs")
    val out = df.select(col("id"), native.simhash64(col("hs")))
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 0L)
    assert(out(2L) == 0x0F0F0F0F0F0F0F0FL)
  }

  test("minhash_sig: length k, permutation-monotone (superset has ≤ minima)") {
    val df = Seq(
      (Array("a", "b"), Array("a", "b", "c"))
    ).toDF("small", "big")
    val row = df.select(native.minhash_sig(col("small"), 8).as("s"),
      native.minhash_sig(col("big"), 8).as("b")).head()
    val s = row.getSeq[Long](0); val b = row.getSeq[Long](1)
    assert(s.length == 8 && b.length == 8)
    assert(s.zip(b).forall { case (x, y) => y <= x }) // adding elements can only lower minima
  }

  test("rolling_min_hash: short strings hash whole; equal prefixes differ on tails") {
    val df = Seq(("ab", "ab", "abcdefghXX", "abcdefghYY"))
      .toDF("s1", "s2", "l1", "l2")
    val r = df.select(
      native.rolling_min_hash(col("s1"), 8), native.rolling_min_hash(col("s2"), 8),
      native.rolling_min_hash(col("l1"), 8), native.rolling_min_hash(col("l2"), 8)).head()
    assert(r.getLong(0) == r.getLong(1))
    // both long strings contain the window "abcdefgh"; min may coincide,
    // but each must be ≤ the shared window's hash — sanity: deterministic
    assert(r.getLong(2) == df.select(native.rolling_min_hash(col("l1"), 8)).head().getLong(0))
  }

  test("SQL registration rejects wrong arity with a clear message") {
    native.registerAll(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1.0F))").collect()
    }
    assert(e.getMessage.contains("cosine_sim expects 2 arguments") ||
      e.getMessage.contains("2"))
  }
}

package graft.ext

import graft.SparkSuite

/** Hand-computed PMI and SQ8 quantization invariants. */
class CollocationSq8Spec extends SparkSuite {
  import spark.implicits._

  test("pmi of a perfectly-associated pair matches the hand value") {
    // tokens: p,q x3; r x2; s,t x1 => N_tok=10. bigrams: "p q" x3,
    // "r s", "s r", "r t" => N_bi=6. minCount=2 keeps only (p,q):
    // pmi = ln((3/6) / ((3/10)*(3/10))) = ln(5.0/0.9)
    val docs = Seq(
      (0L, "p q", "en", "t", 3L), (1L, "p q", "en", "t", 3L),
      (2L, "p q", "en", "t", 3L), (3L, "r s r t", "en", "t", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = TextAnalysis.pmiCollocations(docs, minCount = 2, k = 10).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("a") == "p" && r.getAs[String]("b") == "q")
    assert(r.getAs[Long]("n_ab") == 3L)
    val expected = math.rint(math.log((3.0 / 6) / ((3.0 / 10) * (3.0 / 10))) * 1e6) / 1e6
    assert(r.getAs[Double]("pmi") == expected)
  }

  test("associated pair outranks an equally frequent independent pair") {
    // (u,v) always adjacent; w as frequent but adjacent to varying tokens
    val docs = Seq(
      (0L, "u v a w b", "en", "t", 9L), (1L, "u v c w d", "en", "t", 9L),
      (2L, "u v e w f", "en", "t", 9L), (3L, "u v g w h", "en", "t", 9L),
      (4L, "u v i w j", "en", "t", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = TextAnalysis.pmiCollocations(docs, minCount = 5, k = 10).collect()
    assert(rows.nonEmpty)
    assert(rows.head.getAs[String]("a") == "u" && rows.head.getAs[String]("b") == "v")
  }

  test("planted new-snapshot term tops the KL drift report") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    // identical halves except 'zzz' floods the odd (new) snapshot
    val docs = (0L until 20L).map { id =>
      val base = "alpha beta gamma delta"
      val text = if (id % 2 == 1) base + " zzz zzz zzz" else base
      (id, text, "en", "t", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = TextAnalysis.tokenDriftKl(docs,
      pmod(col("doc_id"), lit(2)) === 1, k = 5).collect()
    assert(rows.head.getAs[String]("term") == "zzz")
    assert(rows.head.getAs[Long]("n_old") == 0L)
    assert(rows.head.getAs[Long]("n_new") == 30L)
    assert(rows.head.getAs[Double]("kl_term") > 0.0)
  }

  test("sq8 error is bounded by half a quantization step on the fixture") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    // widest per-dim step across the table bounds every half-step error
    val maxStep = emb
      .select(org.apache.spark.sql.functions.posexplode(
        org.apache.spark.sql.functions.col("embedding")).as(Seq("i", "x")))
      .groupBy("i")
      .agg(((org.apache.spark.sql.functions.max("x")
        - org.apache.spark.sql.functions.min("x")) / 255).as("step"))
      .agg(org.apache.spark.sql.functions.max("step")).collect().head.getDouble(0)
    val rows = Similarity.sq8ReconError(emb).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("mse") >= 0.0)
      assert(r.getAs[Double]("max_abs_err") <= maxStep / 2 + 1e-9)
    }
  }

  test("grid-aligned vectors reconstruct exactly") {
    // values already at code points (lo=0, hi=255, scale=1)
    val emb = Seq(
      (0L, Array(0f, 255f, 17f)), (1L, Array(255f, 0f, 200f)))
      .toDF("vec_id", "embedding")
    val rows = Similarity.sq8ReconError(emb).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Double]("mse") == 0.0)
      assert(r.getAs[Double]("max_abs_err") == 0.0)
    }
  }
}

package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSuite {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // the classic BPE toy corpus: hug×3, pug×1, pun×1
  private def hugs = docs((1L, "hug hug hug pug"), (2L, "pun"))

  test("hand-computed merge sequence, vocab, and encode stats") {
    val (merges, state) = Bpe.train(hugs, nMerges = 5)
    // pair counts round 1: (u,g)=4, (h,u)=3, (p,u)=2, (u,n)=1
    // round 3 is the tie case: (p,u) beats (p,ug) on rhs asc at n=1
    assert(merges.map(m => (m.rank, m.lhs, m.rhs, m.pairN)) == Seq(
      (1, "u", "g", 4L), (2, "h", "ug", 3L), (3, "p", "u", 1L),
      (4, "p", "ug", 1L), (5, "pu", "n", 1L)))
    val vocab = Bpe.vocab(state).as[(String, Long)].collect().toSeq
    assert(vocab == Seq(("hug", 3L), ("pug", 1L), ("pun", 1L)))
    val stats = Bpe.encodeStats(hugs, state, merges)
      .as[(Long, Long, Long)].collect().toSeq
    assert(stats == Seq((1L, 4L, 4L), (2L, 1L, 1L)),
      "every word collapses to one learned token")
  }

  test("encode stats on held-out text: OOV words fold, never drop") {
    val (merges, state) = Bpe.train(hugs, nMerges = 3)
    // "hugpun" is not a training word: chars + merges 1-3 → hug, pu, n
    val stats = Bpe.encodeStats(
        Seq((9L, "hug hugpun")).toDF("doc_id", "text"), state, merges)
      .as[(Long, Long, Long)].collect().toSeq
    assert(stats == Seq((9L, 2L, 4L)),
      "2 words; hug→1 token via vocab, hugpun→3 tokens via the fold")
  }

  test("non-BMP characters segment as whole code points, not surrogates") {
    val (merges, state) = Bpe.train(
      Seq((1L, "𝕏y 𝕏y")).toDF("doc_id", "text"),
      nMerges = 1)
    assert(merges.head.lhs == "𝕏" && merges.head.rhs == "y")
    assert(merges.head.lhs.codePointCount(0, merges.head.lhs.length) == 1,
      "lhs must be ONE code point, not a lone surrogate")
    val vocab = Bpe.vocab(state).as[(String, Long)].collect().toSeq
    assert(vocab == Seq(("𝕏y", 2L)))
  }

  test("greedy merge application is left-to-right, non-overlapping") {
    val seg = Seq(Bpe.Merge(1, "a", "a", 0L))
    val out = Seq("aaaa", "aaa", "aba").toDF("w")
      .select(col("w"), Bpe.applyMerges(col("w"), seg).as("syms"))
      .as[(String, Seq[String])].collect().toMap
    assert(out("aaaa") == Seq("aa", "aa"))
    assert(out("aaa") == Seq("aa", "a"))
    assert(out("aba") == Seq("a", "b", "a"))
  }

  test("OOV fold path segments exactly like the trained vocabulary") {
    val (merges, state) = Bpe.train(hugs, nMerges = 3)
    val stored = state.select(col("w"), col("syms"))
      .as[(String, Seq[String])].collect().toMap
    val refolded = state.select(col("w"),
        Bpe.applyMerges(col("w"), merges).as("s2"))
      .as[(String, Seq[String])].collect().toMap
    assert(stored == refolded)
    // a genuinely unseen word goes through the same merges
    val oov = Seq("hugpun").toDF("w")
      .select(Bpe.applyMerges(col("w"), merges).as("s"))
      .as[Seq[String]].head()
    // (u,g) → (h,ug) → (p,u): h u g p u n ⇒ hug, pu, n
    assert(oov == Seq("hug", "pu", "n"))
  }

  test("training past exhaustion fails loudly, not silently") {
    val e = intercept[IllegalArgumentException](Bpe.train(hugs, nMerges = 6))
    assert(e.getMessage.contains("round 6"))
  }

  test("merge sequence is invariant under input partitioning") {
    val a = Bpe.train(hugs.repartition(1), nMerges = 4)._1
    val b = Bpe.train(hugs.repartition(5), nMerges = 4)._1
    assert(a == b)
  }

  test("fertility: per-lang totals recount, ratios exact on the ppm grid") {
    val docs = graft.Tables.documents(spark, sfDir)
    val (merges, state) = Bpe.train(docs, nMerges = 4) match {
      case (m, s) => (m, s)
    }
    val fert = Bpe.fertility(docs, state, merges).collect()
    import org.apache.spark.sql.functions._
    assert(fert.map(_.getAs[Long]("n_docs")).sum == docs.count())
    assert(fert.map(_.getAs[Long]("n_chars")).sum ==
      docs.agg(sum(col("n_chars"))).head().getLong(0))
    val enc = Bpe.encodeStats(docs, state, merges)
      .agg(sum(col("n_tokens"))).head().getLong(0)
    assert(fert.map(_.getAs[Long]("n_tokens")).sum == enc)
    fert.foreach { r =>
      val (c, w, t) = (r.getAs[Long]("n_chars"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_tokens"))
      // BPE emits >= 1 subword per word, so tokens/word >= 1.0
      assert(r.getAs[Long]("tokens_per_word_ppm") >= 1000000L)
      assert(r.getAs[Long]("chars_per_token_ppm") ==
        (2 * BigInt(c) * 1000000 + t) / (2 * BigInt(t)))
      assert(r.getAs[Long]("tokens_per_word_ppm") ==
        (2 * BigInt(t) * 1000000 + w) / (2 * BigInt(w)))
    }
  }
}

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
    val stats = Bpe.encodeStats(hugs, merges)
      .as[(Long, Long, Long)].collect().toSeq
    assert(stats == Seq((1L, 4L, 4L), (2L, 1L, 1L)),
      "every word collapses to one learned token")
  }

  test("encode stats on held-out text: OOV words fold, never drop") {
    val (merges, state) = Bpe.train(hugs, nMerges = 3)
    // "hugpun" is not a training word: chars + merges 1-3 → hug, pu, n
    val stats = Bpe.encodeStats(
        Seq((9L, "hug hugpun")).toDF("doc_id", "text"), merges)
      .as[(Long, Long, Long)].collect().toSeq
    assert(stats == Seq((9L, 2L, 4L)),
      "2 words; hug→1 token, hugpun→3 tokens through the kernel")
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

  test("native kernel counts equal the layered fold on every corpus word") {
    // the SQL-replayable twin (applyMerges, M aggregate layers) pins
    // the kernel's greedy semantics word by word — including OOV
    // shapes, ties, merged-symbol-as-next-lhs, and non-BMP chars
    val (merges, _) = Bpe.train(hugs, nMerges = 5)
    val words = graft.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .union(Seq("hugpun", "aaaa", "𝕏y𝕏", "hug").toDF("w"))
    val mismatch = words
      .select(col("w"),
        graft.functions.native.bpe_token_count(col("w"),
          merges.map(_.lhs).toArray, merges.map(_.rhs).toArray).as("k_native"),
        size(Bpe.applyMerges(col("w"), merges)).cast("long").as("k_fold"))
      .filter(col("k_native") =!= col("k_fold"))
    assert(mismatch.isEmpty, s"kernel/fold divergence: ${mismatch.take(5).toSeq}")
  }

  test("doc-stats kernel equals the exploded word-level aggregation") {
    // encodeStats (one docStats call per document) must agree with the
    // explode + per-word kernel + groupBy shape it replaced, including
    // empty-text / spaces-only docs dropping and multi-space runs
    val (merges, _) = Bpe.train(hugs, nMerges = 3)
    val tricky = docs((1L, "hug  pug hug"), (2L, ""), (3L, "   "),
      (4L, "hugpun"), (5L, " pun "), (6L, "𝕏y 𝕏"))
    val viaDoc = Bpe.encodeStats(tricky, merges)
      .as[(Long, Long, Long)].collect().toSeq
    val viaWords = tricky
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(col("doc_id"),
        graft.functions.native.bpe_token_count(col("w"),
          merges.map(_.lhs).toArray, merges.map(_.rhs).toArray).as("k"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("k")).as("n_tokens"))
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(viaDoc == viaWords)
    assert(!viaDoc.exists(r => r._1 == 2L || r._1 == 3L),
      "no-word documents drop, as under explode")
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
    val fert = Bpe.fertility(docs, merges).collect()
    import org.apache.spark.sql.functions._
    assert(fert.map(_.getAs[Long]("n_docs")).sum == docs.count())
    assert(fert.map(_.getAs[Long]("n_chars")).sum ==
      docs.agg(sum(col("n_chars"))).head().getLong(0))
    val enc = Bpe.encodeStats(docs, merges)
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

  test("trained(): persisted artifact equals a fresh train, serves warm, retrains on change") {
    import org.apache.spark.sql.functions._
    val d = graft.Tables.documents(spark, sfDir)
    val key = s"bpetest_${System.nanoTime()}"
    val adir = s"target/artifacts/$key/bpe_m4"
    val (mStored, stStored) = Bpe.trained(spark, d, key, nMerges = 4)
    val (mFresh, stFresh) = Bpe.train(d, nMerges = 4)
    assert(mStored == mFresh, "persisted merge list must equal a fresh train")
    // vocabulary derived from the persisted state must match exactly
    val vs = Bpe.vocab(stStored).collect().toSeq
    val vf = Bpe.vocab(stFresh).collect().toSeq
    assert(vs == vf)
    // warm serve: ensure under the same corpus must not rewrite
    val mt = new java.io.File(s"$adir/merges").lastModified
    assert(mt > 0, "artifact must exist on disk")
    // distinct memo key (different nMerges param path exercised via a
    // fresh key) — here re-ensure directly, bypassing the memo
    Artifact.ensure(spark, adir,
      s"bpe v1 m=4 fp=${Artifact.fingerprint(d, col("doc_id"), col("text"))}") {
      fail("warm ensure must serve, not rebuild")
    }
    assert(new java.io.File(s"$adir/merges").lastModified == mt)
    deleteRecursively(s"target/artifacts/$key")
  }
}

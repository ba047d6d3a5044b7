package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  test("token counts and quality features") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val out = TextAnalysis.qualityFeatures(df).head()
    assert(out.getAs[Int]("n_tokens") == 6)
    assert(out.getAs[Int]("n_chars_measured") == 22)
    assert(math.abs(out.getAs[Double]("stopword_ratio") - 3.0 / 6) < 1e-9 ||
      // array_intersect dedups 'the'; accept the distinct-count semantic
      math.abs(out.getAs[Double]("stopword_ratio") - 2.0 / 6) < 1e-9)
  }

  test("redactPii: planted PII redacted with exact counts; idempotent; no false positives") {
    val df = Seq(
      (1L, "contact me at alice.smith+x@corp.example.org or bob@ex.io thanks"),
      (2L, "server at 192.168.0.17 responded then 10.0.0.1 timed out"),
      (3L, "call 415-555-0123 or 650.555.9876 today"),
      (4L, "plain text with no personal data at all"),
      (5L, "version 1.2 costs 3.50 and a.b is not an email @ alone"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(df)
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"), col("text"))
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(r(0) == ((1L, 2L, 0L, 0L, "contact me at <EMAIL> or <EMAIL> thanks")))
    assert(r(1) == ((2L, 0L, 2L, 0L, "server at <IP> responded then <IP> timed out")))
    assert(r(2) == ((3L, 0L, 0L, 2L, "call <PHONE> or <PHONE> today")))
    // no false positives: plain words, bare decimals, detached '@'
    assert(r(3) == ((4L, 0L, 0L, 0L, "plain text with no personal data at all")))
    assert(r(4)._2 == 0 && r(4)._3 == 0 && r(4)._4 == 0)
    // idempotent: placeholders match none of the patterns
    val again = TextAnalysis.redactPii(
        TextAnalysis.redactPii(df).select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"), col("text"))
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(again.map(x => (x._1, x._5)).toSeq == r.map(x => (x._1, x._5)).toSeq)
    assert(again.forall(x => x._2 == 0 && x._3 == 0 && x._4 == 0))
  }

  test("language-ID picks the language with most marker hits") {
    val df = Seq(
      (1L, "the house and the dog is big"),   // en
      (2L, "el perro de la casa que ladra"),  // es
      (3L, "der hund und die katze das haus") // de
    ).toDF("doc_id", "text")
    val out = TextAnalysis.withPredictedLang(df)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "de")
  }

  test("fingerprint is deterministic and text-sensitive") {
    val df = Seq((1L, "abcdefghij"), (2L, "abcdefghij"), (3L, "abcdefghiK"))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.withFingerprint(df)
      .select("doc_id", "fingerprint").as[(Long, String)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
    val fast = TextAnalysis.withFingerprintFast(df)
      .select("doc_id", "fingerprint").as[(Long, Long)].collect().toMap
    assert(fast(1L) == fast(2L))
    assert(fast(1L) != fast(3L))
  }

  test("fingerprint equals the min token-4-gram md5") {
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val want = df.selectExpr(
      "least(md5('a b c d'), md5('b c d e')) AS fp").head().getString(0)
    val got = TextAnalysis.withFingerprint(df)
      .select("fingerprint").head().getString(0)
    assert(got == want)
  }

  test("bpe-ish tokenizer splits camelCase and digit boundaries") {
    val df = Seq((1L, "fooBar baz42qux")).toDF("doc_id", "text")
    val toks = df.select(TextAnalysis.bpeishTokens(col("text"))).head().getSeq[String](0)
    assert(toks == Seq("foo", "Bar", "baz", "42", "qux"))
  }

  test("normalize: masks PII, lowercases, strips punctuation, collapses space") {
    val df = Seq((1L, "Contact Bob.Smith+x@ex-ample.org or  call 1234567890!  NOW")).toDF("doc_id", "text")
    val out = df.select(TextAnalysis.normalize(col("text"))).head().getString(0)
    assert(out == "contact <email> or call <num> now", out)
  }

  test("chunking: overlapping windows cover every token, tail truncates") {
    // 100 tokens, size 64 / stride 48 → chunks at 1..64, 49..100, 97..100
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val out = TextAnalysis.chunkTokens(Seq((1L, text)).toDF("doc_id", "text"))
      .select("chunk_idx", "n_chunk_tokens").as[(Long, Int)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(out.map(_._2).toSeq == Seq(64, 52, 4))
    // single short doc → exactly one chunk with all tokens
    val one = TextAnalysis.chunkTokens(Seq((2L, "a b c")).toDF("doc_id", "text"))
      .select("chunk_idx", "n_chunk_tokens").as[(Long, Int)].collect()
    assert(one.toSeq == Seq((0L, 3)))
  }

  test("decontamination: flags only docs sharing a w-gram with the benchmark") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // contains bench 5-gram
      (2L, "one two three four five six seven")      // clean
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "XX alpha beta gamma delta epsilon YY")
    ).toDF("doc_id", "text")
    val out = Dedup.contaminationReport(corpus, bench)
      .as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(1L))
    assert(out(1L) == 1L) // exactly the shared "alpha..epsilon" 5-gram

    val clean = Dedup.removeContaminated(corpus, bench)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L), "removal must drop exactly the flagged doc")
  }

  test("stratified sample: deterministic, rate-ordered, zero-rate empty") {
    val docs = (1L to 2000L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
      .toDF("doc_id", "lang")
    def run() = TextAnalysis.sampleStratified(docs, "lang", "doc_id",
      Map("en" -> 300, "zh" -> 50)).select("doc_id").as[Long].collect().toSet
    val s1 = run()
    assert(s1 == run(), "hash sampling must be reproducible")
    val byLang = TextAnalysis.sampleStratified(docs, "lang", "doc_id",
      Map("en" -> 300, "zh" -> 50)).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    // 1000 docs per stratum: expect ~300 vs ~50, allow generous slack
    assert(byLang("en") > 2 * byLang("zh"),
      s"en rate 300‰ must dominate zh 50‰: $byLang")
    assert(TextAnalysis.sampleStratified(docs, "lang", "doc_id", Map.empty).isEmpty)
  }

  test("length-quantile floor: kept iff token count reaches the corpus quantile") {
    val df = (1L to 20L).map(i => (i, (1L to i).map(_ => "w").mkString(" ")))
      .toDF("doc_id", "text")  // doc i has exactly i tokens
    val kept = TextAnalysis.keepAboveLengthQuantile(df, q = 0.25)
      .select("doc_id").as[Long].collect().toSet
    // 25th percentile of 1..20 (interpolated) = 1 + 0.25*19 = 5.75
    assert(kept == (6L to 20L).toSet, s"kept $kept")
    // q=0 keeps everything; the filter is a subset by construction
    assert(TextAnalysis.keepAboveLengthQuantile(df, q = 0.0).count() == 20)
  }

  test("repetition features: hand-computed modes, edge cases, threshold rule") {
    val docs = Seq(
      (1L, "a b a b a c"),       // 6 toks, 3 distinct; top tok 'a'×3; top bigram 'a b'×2 of 5
      (2L, "x x x x"),           // degenerate repetition: fails the rule
      (3L, "one two three four five six seven eight nine ten"), // all distinct: passes
      (4L, "solo")               // single token: no bigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionFeatures(docs)
      .select("doc_id", "n_tokens", "distinct_token_ratio", "top_token_count",
        "top_bigram_count", "top_bigram_fraction", "repetition_pass")
      .as[(Long, Long, Double, Long, Long, Double, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 6L, 0.5, 3L, 2L, 0.4, 0)))
    assert(out(2L) == ((2L, 4L, 0.25, 4L, 3L, 1.0, 0)))
    assert(out(3L) == ((3L, 10L, 1.0, 1L, 1L, 1.0 / 9, 0)))
    assert(out(4L) == ((4L, 1L, 1.0, 1L, 0L, 0.0, 0)),
      "a single-token doc has no bigrams but its top token IS the doc (fraction 1.0): fails")
  }

  test("curation funnel: one doc dropped per stage, doc and token counts") {
    def words(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val docs = Seq(
      (1L, words("w", 30)),                                  // passes all; sample keeps (bucket 226)
      (2L, words("v", 30)),                                  // passes filters; sample drops (bucket 987)
      (3L, words("b", 5)),                                   // fails length floor
      (4L, "the a of and to in is on " + words("c", 22)),    // stopword frac 8/30 > 0.12
      (5L, words("d", 25) + " z z z z z")                    // top token frac 5/30 > 0.12
    ).toDF("doc_id", "text")
    val out = TextAnalysis.curationFunnel(docs)
      .select("stage_idx", "stage", "n_docs", "n_tokens")
      .as[(Int, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (0, "input", 5L, 125L),
      (1, "length_floor", 4L, 120L),
      (2, "stopword_cap", 3L, 90L),
      (3, "repetition", 2L, 60L),
      (4, "sample", 1L, 30L)), out.toString)
  }

  test("quality deciles: broadcast percentile thresholds, per-language") {
    val en = (1 to 10).map(i => (i.toLong, "x" * (10 * i), "en"))
    val fr = (11 to 15).map(i => (i.toLong, "y" * 7, "fr"))
    val docs = (en ++ fr).toDF("doc_id", "text", "lang")
    val buckets = TextAnalysis.qualityDecileBuckets(docs)
      .select("doc_id", "bucket").as[(Long, Int)].collect().toMap
    // en lengths 10..100: thresholds interpolate to 19,28,...,91 — each
    // doc lands in its own decile
    (1 to 10).foreach(i => assert(buckets(i.toLong) == i, s"doc $i"))
    // fr: all lengths equal → every threshold equals the score, nothing
    // is strictly below it → everyone in bucket 1
    (11 to 15).foreach(i => assert(buckets(i.toLong) == 1, s"doc $i"))
  }

  test("extractMarkup: scripts/styles/comments dropped whole, tags stripped, entities decoded") {
    val html = "<html><head><style>p{x}</style>" +
      "<script>var s = 'keep<b>out</b>';</script></head>" +
      "<body><h1>Title</h1><p>one &amp; two &lt;three&gt;</p>" +
      "<!-- hidden\ncomment --><div>tail&nbsp;end</div></body></html>"
    val out = Seq(html).toDF("h")
      .select(TextAnalysis.extractMarkup($"h")).head().getString(0)
    assert(out == "Title one & two <three> tail end")
  }

  test("extractMarkup: &amp; decodes LAST — no double-decode of escaped entities") {
    // "&amp;lt;" is the literal four characters "&lt;" in the source
    // text; decoding &amp; first would turn it into "<"
    val out = Seq("<p>&amp;lt;not-a-tag&amp;gt;</p>").toDF("h")
      .select(TextAnalysis.extractMarkup($"h")).head().getString(0)
    assert(out == "&lt;not-a-tag&gt;")
  }

  test("extractMarkup: round-trips the query's constructed shell back to its parts") {
    // the registered query wraps fixture text in a deterministic
    // shell; stripping must recover title + h1 + body text + nav, with
    // the paragraph re-split ('. ' → '.</p><p>') invisible after
    // whitespace collapse
    val text = "alpha beta. gamma delta. epsilon"
    val html = "<html><head><title>src</title><style>p{margin:0}</style>" +
      "<script type=\"text/javascript\">var id=7;</script></head><body>" +
      "<h1>src</h1><p>" + text.replace(". ", ".</p><p>") + "</p><!-- id:7 -->" +
      "<div class=\"nav\">Home &amp; About &gt; Contact</div></body></html>"
    val out = Seq(html).toDF("h")
      .select(TextAnalysis.extractMarkup($"h")).head().getString(0)
    assert(out == s"src src $text Home & About > Contact")
  }
}

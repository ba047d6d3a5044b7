package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline over
  * the `documents` table: token counting, quality scoring, language-ID,
  * and document fingerprinting. All are narrow per-row expressions —
  * shuffle-free until a final aggregation — so they scale linearly with
  * document count.
  */
object TextAnalysis {

  /** Whitespace tokens (fixture texts are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish sub-word segmentation: split on word boundaries and digit
    * runs — a deterministic stand-in for a real BPE vocab that keeps the
    * token-count statistics realistic.
    */
  def bpeishTokens(text: Column): Column =
    filter(split(text, "(?<=[a-z])(?=[A-Z0-9])|\\s+|(?<=[0-9])(?=[a-z])"), t => length(t) > 0)

  /** PII scrubbing (the Dolma/FineWeb pre-release stage): regex-redact
    * email addresses, US-style phone numbers, and IPv4 addresses to
    * typed placeholder tokens, and count each kind per document (the
    * redaction-rate report a release pipeline publishes). Patterns are
    * deliberately in the common subset of Java regex (Spark) and RE2
    * (the oracle's engine): character classes, bounded repetition, and
    * ASCII word boundaries only — no lookarounds or backreferences.
    * Order matters and is fixed: emails first (so their dotted domains
    * can never half-match the IP pattern), then IPs, then phones.
    * Per-row, shuffle-free, idempotent (placeholders match none of the
    * patterns).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  def redactPii(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", regexp_count(t, lit(EmailRe)).cast("long"))
      .withColumn("n_ips", regexp_count(t, lit(Ipv4Re)).cast("long"))
      .withColumn("n_phones", regexp_count(t, lit(PhoneRe)).cast("long"))
      .withColumn(textCol,
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          PhoneRe, "<PHONE>"))
  }

  /** Quality features (length / punctuation / stopword ratios) — the
    * standard cheap heuistics used to filter training corpora.
    */
  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  def qualityFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    // bind the split ONCE as a column: repeating the expression per
    // output column would re-tokenize per reference at runtime
    // (higher-order/array expressions evaluate interpreted, with no
    // runtime subexpression elimination; CollapseProject keeps
    // non-cheap multi-referenced aliases as attributes, so a named
    // column really is computed once)
    val toks = col("__toks")
    val stop = array(StopWords.map(lit): _*)
    df.withColumn("__toks", tokens(t))
      .withColumn("n_tokens", size(toks))
      .withColumn("n_chars_measured", length(t))
      .withColumn("avg_token_len",
        (length(t) - (size(toks) - lit(1))).cast("double") / size(toks))
      .withColumn("stopword_ratio",
        size(array_intersect(toks, stop)).cast("double") / size(toks))
      .withColumn("punct_ratio",
        (length(t) - length(regexp_replace(t, "[.,!?;:]", ""))).cast("double") /
          greatest(length(t), lit(1)))
      .drop("__toks")
  }

  /** Corpus-RELATIVE curation floor: keep documents whose token count
    * reaches the corpus's q-quantile — "drop the shortest quartile"
    * instead of a fixed cutoff, so the threshold adapts to the corpus
    * at hand (the usual way length floors are actually set). Two jobs:
    * a one-row exact-percentile aggregate (broadcast as a scalar), then
    * a pushable filter pass — the corpus never shuffles. At 100 TB the
    * exact percentile (which buffers per-group values) swaps for
    * `approx_percentile`'s fixed-memory sketch, same dataflow (the
    * documented A7/a11 trade).
    */
  def keepAboveLengthQuantile(docs: DataFrame, q: Double = 0.25): DataFrame = {
    val toks = size(tokens(col("text")))
    val thr = docs.agg(expr(s"percentile(size(split(text, ' ')), $q)").as("thr"))
    docs.crossJoin(broadcast(thr)).filter(toks >= col("thr")).drop("thr")
  }

  /** Adjacent-token bigrams of a token array (`n-1` entries; empty for
    * single-token docs). This is the semantic reference for
    * [[graft.functions.TokenRepetitionStats]]' `top_bigram` count —
    * tokens are space-free, so multiplicity of these joined strings
    * equals multiplicity of the (tokenᵢ, tokenᵢ₊₁) pairs the native
    * expression counts.
    */
  def bigramsOf(toks: Column): Column =
    when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b)))

  /** Gopher-style repetition signals (Rae et al., "Scaling Language
    * Models", table A1's repetition filters re-expressed over
    * whitespace tokens): distinct-token ratio, most-frequent-token
    * fraction, most-frequent-bigram fraction, plus the pass/fail of a
    * documented threshold rule. All per-row expressions — the mode of a
    * document's tokens comes from an equal-run scan of the sorted token
    * array, not an explode+groupBy (which would shuffle corpus-sized
    * (doc, token) rows for a per-doc statistic).
    */
  def repetitionFeatures(df: DataFrame, textCol: String = "text",
                         minDistinctRatio: Double = 0.40,
                         maxTopTokenFraction: Double = 0.12,
                         maxTopBigramFraction: Double = 0.08): DataFrame = {
    // all four counts come from ONE native hash-count pass per row
    // ([[graft.functions.TokenRepetitionStats]]), bound once as a
    // struct column; the composable formulation (two array_sorts +
    // equal-run aggregate scans) evaluated interpreted and was the
    // heaviest per-row cost in the suite. Ratios are the same double
    // divisions as before (bigram denominator n_tokens - 1 = bigram
    // count), so outputs are bit-identical.
    val rep = col("__rep")
    df.withColumn("__rep",
        graft.functions.native.repetition_stats(tokens(col(textCol))))
      .withColumn("n_tokens", rep.getField("n_tokens"))
      .withColumn("distinct_token_ratio",
        rep.getField("n_distinct").cast("double") / rep.getField("n_tokens"))
      .withColumn("top_token_count", rep.getField("top_token"))
      .withColumn("top_token_fraction",
        col("top_token_count").cast("double") / col("n_tokens"))
      .withColumn("top_bigram_count", rep.getField("top_bigram"))
      .withColumn("top_bigram_fraction",
        when(col("n_tokens") > 1,
          col("top_bigram_count").cast("double") / (col("n_tokens") - 1))
          .otherwise(lit(0.0)))
      .withColumn("repetition_pass",
        (col("distinct_token_ratio") >= minDistinctRatio &&
          col("top_token_fraction") <= maxTopTokenFraction &&
          col("top_bigram_fraction") <= maxTopBigramFraction).cast("int"))
      .drop("__rep")
  }

  /** Language-ID by stopword/character evidence: score each candidate
    * language by hits of its marker tokens, pick the argmax (ties →
    * lexicographic, deterministic). A real system would use character
    * n-gram profiles; the shape (per-row scoring, no shuffle) is what
    * matters at scale.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "la", "de", "que"),
    "fr" -> Seq("le", "la", "et", "les"),
    "de" -> Seq("der", "die", "und", "das"),
    "zh" -> Seq("的", "是", "了", "在"))

  def withPredictedLang(df: DataFrame, textCol: String = "text"): DataFrame = {
    // split bound once (the qualityFeatures note): the five per-language
    // intersects score the same token array, not five re-tokenizations
    val toks = col("__toks")
    val scored = LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(size(array_intersect(toks, array(markers.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    // argmax by (score, then reverse-lexicographic lang) via array_max on
    // structs — struct ordering compares fields left to right.
    df.withColumn("__toks", tokens(col(textCol)))
      .withColumn("pred_lang", array_max(array(scored: _*)).getField("lang"))
      .drop("__toks")
  }

  /** Document fingerprint: the minimum md5 over the text's token
    * 4-grams (winnowing-style min selection; whole-text md5 for docs
    * under 4 tokens). md5 is the cross-engine hash family, so the
    * fingerprint — not just its row count — replays exactly in any SQL
    * engine. The token array is bound once (single-element-array
    * transform idiom) so `split` runs once per document.
    */
  def withFingerprint(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("fingerprint", element_at(transform(
      array(split(col(textCol), " ")), toks =>
        when(size(toks) < 4, md5(col(textCol)))
          .otherwise(array_min(transform(sequence(lit(1), size(toks) - lit(3)),
            i => md5(array_join(slice(toks, i, lit(4)), " ")))))), 1))

  /** The at-scale fingerprint kernel: same rolling-min shape over all
    * 8-byte windows of the raw text via the native
    * [[graft.functions.RollingMinHash]] expression — one XXH64 pass
    * over the bytes, no substrings materialized and no md5 cost. The
    * hash family is engine-private, so this variant is spec-verified
    * rather than oracle-replayed; semantics otherwise match
    * [[withFingerprint]].
    */
  def withFingerprintFast(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("fingerprint", graft.functions.native.rolling_min_hash(col(textCol), 8))

  /** Training-corpus text normalization: PII masking (emails, long digit
    * runs), lowercasing, punctuation stripping, whitespace collapse —
    * all codegen'd per-row regex/string ops, shuffle-free. Patterns stay
    * in the portable regex subset (no lookaround) so the same rules run
    * under Java regex here and RE2-style engines elsewhere.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        lower(regexp_replace(
          regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<email>"),
          "[0-9]{6,}", "<num>")),
        "[.,!?;:]", ""),
      "\\s+", " "))

  /** Context-window chunking: split each document into overlapping
    * token windows (`chunkSize` tokens every `stride`) — the standard
    * pre-tokenization step for LLM training. One explode per doc (≤
    * ceil(n/stride) rows), no shuffle; chunk boundaries are pure integer
    * arithmetic so the operator is exactly reproducible in SQL.
    */
  def chunkTokens(df: DataFrame, chunkSize: Int = 64, stride: Int = 48,
                  textCol: String = "text"): DataFrame =
    df.withColumn("_toks", split(col(textCol), " "))
      .withColumn("chunk_idx",
        explode(expr(s"sequence(0, (size(_toks) + ${stride - 1}) DIV $stride - 1)")))
      .withColumn("_chunk", slice(col("_toks"),
        col("chunk_idx") * lit(stride) + lit(1), lit(chunkSize)))
      .withColumn("chunk_text", array_join(col("_chunk"), " "))
      .withColumn("n_chunk_tokens", size(col("_chunk")))
      .drop("_toks", "_chunk")

  /** Curation-funnel report: how many documents (and tokens) survive
    * each stage of the standard curation chain — length floor →
    * stopword-ratio cap → Gopher repetition filters → deterministic
    * sample. The observability artifact every corpus-curation run ships
    * with (RefinedWeb/Dolma-style "removal chart"): without it, a
    * mis-set threshold silently eats the corpus.
    *
    * Scale shape: ONE pass — each stage is a per-row boolean, the
    * funnel is the conjunction prefix, and the per-stage totals come
    * from conditional sums in a single partial-aggregable `agg` (no
    * per-stage re-scan of the corpus, no shuffle besides the final
    * one-row reduce). The unpivot to report rows happens on that
    * one-row frame.
    */
  def curationFunnel(df: DataFrame, minTokens: Int = 30,
                     maxStopwordFrac: Double = 0.12,
                     samplePermille: Int = 500,
                     mediaOk: Option[DataFrame] = None): DataFrame = {
    val stop = array(StopWords.map(lit): _*)
    // the token array is bound once as a column (the qualityFeatures
    // note); each flag column is bound once and the next flag builds on
    // it by ATTRIBUTE, so no stage predicate is ever re-evaluated
    val toks = col("__toks")
    val nTokens = col("n_tokens")
    val s1 = nTokens >= minTokens
    // true stopword FRACTION (every occurrence counts), not
    // qualityFeatures' distinct-stopwords ratio — a cap on the latter
    // is unreachable once the length floor has passed (≤ 8/minTokens)
    val s2 = size(filter(toks, t => array_contains(stop, t))).cast("double") /
      size(toks) <= maxStopwordFrac
    // the repetition stats (one native hash-count pass per row) are
    // the expensive stage: bound once as a struct column GATED behind
    // the cheap stages — rows the floor/cap dropped get a null struct
    // (when without otherwise), and `k2 && <null comparison>` is false,
    // never null, because And short-circuits on the false left side
    val rep = col("__rep")
    val s3 =
      rep.getField("n_distinct").cast("double") / nTokens >= 0.40 &&
        rep.getField("top_token").cast("double") / nTokens <= 0.12 &&
        (nTokens < 2 ||
          rep.getField("top_bigram").cast("double") / (nTokens - 1) <= 0.08)
    val s4 = (col("doc_id") + lit(1)) * lit(2654435761L) % lit(4294967296L) %
      lit(1000) < lit(samplePermille)
    // optional media stages: per-doc modality OK flags (decoded-stats
    // predicates from the feature store — [[MediaQuality.mediaOkFlags]])
    // joined in SLIM (doc_id + three booleans) and chained after the
    // text stages, so the funnel also reports media survival
    val joined = mediaOk.fold(df)(m =>
      df.join(m.select(col("doc_id"), col("audio_ok"), col("video_ok"),
        col("image_ok")), Seq("doc_id"), "left"))
    val flags0 = joined
      .withColumn("__toks", tokens(col("text")))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("k1", s1)
      .withColumn("k2", col("k1") && s2)
      .withColumn("__rep",
        when(col("k2"), graft.functions.native.repetition_stats(toks)))
      .withColumn("k3", col("k2") && s3)
      .withColumn("k4", col("k3") && s4)
    val flags =
      if (mediaOk.isEmpty)
        flags0.select(col("n_tokens"), col("k1"), col("k2"), col("k3"), col("k4"))
      else flags0
        .withColumn("k5", col("k4") && coalesce(col("audio_ok"), lit(false)))
        .withColumn("k6", col("k5") && coalesce(col("video_ok"), lit(false)))
        .withColumn("k7", col("k6") && coalesce(col("image_ok"), lit(false)))
        .select(col("n_tokens"), col("k1"), col("k2"), col("k3"), col("k4"),
          col("k5"), col("k6"), col("k7"))
    val stages =
      Seq("input" -> lit(true), "length_floor" -> col("k1"),
        "stopword_cap" -> col("k2"), "repetition" -> col("k3"),
        "sample" -> col("k4")) ++
        (if (mediaOk.isEmpty) Seq.empty
         else Seq("media_audio" -> col("k5"), "media_video" -> col("k6"),
           "media_image" -> col("k7")))
    val sums = stages.zipWithIndex.flatMap { case ((_, keep), i) =>
      Seq(sum(when(keep, 1L).otherwise(0L)).as(s"d$i"),
        sum(when(keep, col("n_tokens")).otherwise(0L)).as(s"t$i"))
    }
    val cells = stages.zipWithIndex
      .map { case ((name, _), i) => s"$i, '$name', d$i, t$i" }
      .mkString(", ")
    flags.agg(sums.head, sums.tail: _*)
      .select(expr(s"stack(${stages.size}, $cells) AS " +
        "(stage_idx, stage, n_docs, n_tokens)"))
  }

  /** Corpus-relative quality buckets: assign each document a per-
    * language decile of text length. Thresholds are exact percentiles
    * computed in one tiny per-language aggregate and BROADCAST back —
    * assignment is then a per-row comparison against a 9-element array,
    * so the corpus itself never sorts or shuffles. The NTILE
    * formulation of the same report is a full per-domain sort — the
    * shape that dies first at 100 TB (one skewed language = one
    * unsortable partition); percentile thresholds + broadcast is the
    * scalable equivalent, and swaps to `approx_percentile`'s
    * fixed-memory sketch above memory (the documented A7/a11 trade).
    * Integer scores keep the interpolated thresholds exactly
    * reproducible across engines.
    */
  def qualityDecileBuckets(docs: DataFrame, scoreCol: Column = length(col("text")),
                           domainCol: String = "lang"): DataFrame = {
    val qs = (1 to 9).map(i => s"0.$i").mkString(", ")
    val scored = docs.withColumn("score", scoreCol.cast("long"))
    val thr = scored
      .groupBy(col(domainCol))
      .agg(expr(s"percentile(score, array($qs))").as("thrs"))
    scored
      .join(broadcast(thr), Seq(domainCol))
      .withColumn("bucket",
        (size(filter(col("thrs"), t => t < col("score"))) + 1).cast("int"))
      .drop("thrs")
  }

  /** Deterministic stratified sampling: keep a per-stratum fraction by
    * multiplicative hash of the document id — reproducible across runs
    * and engines (no RNG state), pushes down as a plain filter (no
    * `orderBy(rand())` global sort, which is how sampling jobs die at
    * 100 TB), and composes with partition pruning. `rates` maps stratum
    * value → keep-permille.
    */
  def sampleStratified(df: DataFrame, stratumCol: String, idCol: String,
                       rates: Map[String, Int], defaultPermille: Int = 0): DataFrame = {
    val bucket = (col(idCol) + lit(1)) * lit(2654435761L) % lit(4294967296L) % lit(1000)
    val keep = rates.foldLeft(lit(defaultPermille)) { case (acc, (stratum, permille)) =>
      when(col(stratumCol) === stratum, lit(permille)).otherwise(acc)
    }
    df.filter(bucket < keep)
  }

  /** Corpus-drift report: per-term KL(new‖old) contributions between
    * two snapshots of the corpus (here: the even/odd doc_id halves —
    * callers with real snapshots pass their own split flag). Add-one
    * smoothing over the union vocabulary keeps both distributions
    * strictly positive, so every term's p_new·ln(p_new/p_old) is
    * finite; the top-|contribution| terms ARE the drift explanation a
    * monitoring job pages on.
    *
    * Shape: one token pass groupBy term with two conditional counts
    * (map-side combined), the three totals aggregated FROM that
    * grouped table (no second corpus pass), broadcast back as one row.
    * Integer counts + pinned ratio arithmetic ⇒ hash-verifiable.
    */
  def tokenDriftKl(docs: DataFrame, splitCol: Column, k: Int = 20): DataFrame = {
    val toks = docs.select(splitCol.as("is_new"),
      explode(tokens(col("text"))).as("term"))
    val counts = toks.groupBy(col("term")).agg(
      sum(when(col("is_new"), 0L).otherwise(1L)).as("n_old"),
      sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"))
    val totals = counts.agg(
      sum(col("n_old")).as("t_old"), sum(col("n_new")).as("t_new"),
      count(lit(1)).as("v"))
    counts.crossJoin(broadcast(totals))
      .select(col("term"), col("n_old"), col("n_new"),
        round(((col("n_new") + lit(1)).cast("double") / (col("t_new") + col("v")))
          * log(((col("n_new") + lit(1)).cast("double") / (col("t_new") + col("v")))
            / ((col("n_old") + lit(1)).cast("double") / (col("t_old") + col("v")))),
          6).as("kl_term"))
      .orderBy(abs(col("kl_term")).desc, col("term"))
      .limit(k)
  }

  /** PMI collocations (Church & Hanks 1990): top-k adjacent token
    * pairs by pointwise mutual information ln(p(a,b) / (p(a)·p(b))),
    * p(a,b) over the bigram stream and p(·) over the token stream —
    * the phrase-mining signal tokenizer/vocab pipelines use to promote
    * multi-word units. The `minCount` floor removes the one-off pairs
    * PMI otherwise ranks first.
    *
    * Shape: two map-side-combined count passes (unigram, bigram) + two
    * vocab equi-joins the planner sizes itself (broadcast at fixture
    * scale, shuffle when the vocabulary outgrows it — the BigramModel
    * precedent); the two 1-row totals ride along broadcast. Integer
    * counts, one pinned ratio expression, round-6 — exactly
    * SQL-reproducible.
    */
  def pmiCollocations(docs: DataFrame, minCount: Long = 5, k: Int = 30): DataFrame = {
    val toks = docs.select(explode(tokens(col("text"))).as("term"))
    val uni = toks.groupBy(col("term")).agg(count(lit(1)).as("n"))
    val bi = docs.select(explode(bigramsOf(tokens(col("text")))).as("bg"))
    val biAll = bi.groupBy(col("bg")).agg(count(lit(1)).as("n_ab"))
    val biCnt = biAll.filter(col("n_ab") >= minCount)
    // totals from the grouped tables (Σ group counts ≡ stream count,
    // exactly) — no second explode pass over the corpus per total;
    // AQE's exchange reuse shares the groupBy shuffle with the counts
    val nTok = uni.agg(sum(col("n")).as("n_tok"))
    val nBi = biAll.agg(sum(col("n_ab")).as("n_bi"))
    biCnt
      .withColumn("a", split(col("bg"), " ").getItem(0))
      .withColumn("b", split(col("bg"), " ").getItem(1))
      .join(uni.select(col("term").as("a"), col("n").as("n_a")), Seq("a"))
      .join(uni.select(col("term").as("b"), col("n").as("n_b")), Seq("b"))
      .crossJoin(broadcast(nTok))
      .crossJoin(broadcast(nBi))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        round(log((col("n_ab").cast("double") / col("n_bi")) /
          ((col("n_a").cast("double") / col("n_tok")) *
            (col("n_b").cast("double") / col("n_tok")))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Markup-to-text extraction (the trafilatura/jusText stage of a web
    * corpus pipeline, reduced to its deterministic core): drop
    * script/style payloads and comments WHOLE (their inner text is
    * never corpus text), strip remaining tags, decode the five XML
    * entities + `&nbsp;`, collapse whitespace. Every rule is a
    * codegen'd per-row regex/replace in the portable subset shared by
    * Java regex and RE2 (non-greedy + DOTALL, character classes, no
    * lookaround), so the identical chain runs in the DuckDB oracle.
    * `&amp;` decodes LAST: "&amp;lt;" is literal "&lt;" in the source
    * and must not double-decode into "<".
    */
  def extractMarkup(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val decoded = replace(
      replace(
        replace(
          replace(
            replace(noTags, lit("&nbsp;"), lit(" ")),
            lit("&quot;"), lit("\"")),
          lit("&gt;"), lit(">")),
        lit("&lt;"), lit("<")),
      lit("&amp;"), lit("&"))
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}

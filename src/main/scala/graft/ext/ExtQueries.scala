package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** North-star operator queries (SURVEY.md §7.4): dedup, similarity
  * search, text analysis. SQL-expressible ones carry DuckDB oracles;
  * the sketch/LSH ops are rows-only checked here and property-tested in
  * scalatest.
  */
object ExtQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup via content hash groupBy.
    "dedup_exact" -> ((s, d) =>
      Dedup.exact(Tables.documents(s, d))
        .orderBy(col("keep_doc_id"))),

    // MinHash + LSH near-dup candidate pairs, exact-Jaccard verified.
    "dedup_minhash_lsh" -> ((s, d) =>
      Dedup.minhashPairs(Tables.documents(s, d))
        .orderBy(col("a_id"), col("b_id"))),

    // SimHash Hamming-distance near-dup pairs (pigeonhole banding).
    "dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(Tables.documents(s, d), maxHamming = 16)
        .orderBy(col("a_id"), col("b_id"))),

    // Top-K n-gram-Jaccard pairs among LSH candidates.
    "dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.topJaccardPairs(Tables.documents(s, d))
        .orderBy(col("jaccard").desc, col("a_id"), col("b_id"))),

    // Embedding-cosine near-dup pairs.
    "dedup_embed_cosine" -> ((s, d) =>
      Similarity.cosineNearDupPairs(Tables.embeddings(s, d))
        .orderBy(col("cos").desc, col("a_id"), col("b_id"))),

    // Exact brute-force cosine top-k (baseline ANN path).
    "sim_bruteforce_topk" -> ((s, d) =>
      Similarity.bruteForceTopK(Tables.embeddings(s, d))
        .orderBy(col("q_id"), col("rank"))),

    // SRP-LSH bucketed ANN (scale path).
    "sim_lsh_topk" -> ((s, d) =>
      Similarity.lshTopK(Tables.embeddings(s, d))
        .orderBy(col("q_id"), col("rank"))),

    // IVF coarse-quantizer ANN (alternate scale path).
    "sim_ivf_topk" -> ((s, d) =>
      Similarity.ivfTopK(Tables.embeddings(s, d))
        .orderBy(col("q_id"), col("rank"))),

    // Token counting per language (whitespace tokenizer).
    "text_token_stats" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), size(TextAnalysis.tokens(col("text"))).as("n_tokens"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          (sum(col("n_tokens")).cast("double") / count(lit(1))).as("avg_tokens"))
        .orderBy(col("lang"))),

    // Per-document quality features (row-level).
    "text_quality" -> ((s, d) =>
      TextAnalysis.qualityFeatures(Tables.documents(s, d))
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          col("n_chars_measured").cast("long").as("n_chars_measured"),
          col("avg_token_len"), col("stopword_ratio"))
        .orderBy(col("doc_id"))),

    // Language-ID heuristic vs labeled lang: confusion counts.
    "text_langid" -> ((s, d) =>
      TextAnalysis.withPredictedLang(Tables.documents(s, d))
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("pred_lang"))),

    // Winnowing-style rolling-hash fingerprints.
    "text_fingerprint" -> ((s, d) =>
      TextAnalysis.withFingerprint(Tables.documents(s, d))
        .select(col("doc_id"), col("fingerprint"))
        .orderBy(col("doc_id"))),

    // Multimodal: binary media column → batched decode/feature-extract
    // (mapPartitions, stubbed codec — see Multimodal scaladoc).
    "mm_decode_features" -> ((s, d) =>
      Multimodal.decodeFeatures(s, Multimodal.withFakeMedia(Tables.documents(s, d)))
        .toDF()
        .orderBy(col("doc_id"))),

    // Multimodal: metadata-only resize (never touches the payload).
    "mm_resize_meta" -> ((s, d) =>
      Multimodal.resizeMeta(Multimodal.withFakeMedia(Tables.documents(s, d)), 48)
        .select(col("doc_id"), col("width"), col("height"),
          col("out_width"), col("out_height"))
        .orderBy(col("doc_id"))),

    // Multimodal: video-style frame sampling (explode into strided slices).
    "mm_frame_sample" -> ((s, d) =>
      Multimodal.sampleFrames(Multimodal.withFakeMedia(Tables.documents(s, d)))
        .select(col("doc_id"), col("frame"), length(col("frame_bytes")).as("frame_len"))
        .orderBy(col("doc_id"), col("frame"))),

    // JSON extraction + aggregation over events.props.
    "json_extract_agg" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type")))
  )

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT sha256(text) AS content_hash, MIN(doc_id) AS keep_doc_id,
        |  COUNT(*) AS n_copies
        |FROM documents GROUP BY text
        |ORDER BY keep_doc_id""".stripMargin,

    "text_token_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_tokens
        |FROM documents GROUP BY lang
        |ORDER BY lang""".stripMargin,

    "text_quality" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  length(text) AS n_chars_measured,
        |  CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS avg_token_len,
        |  CAST(len(list_intersect(string_split(text, ' '),
        |       ['the','a','of','and','to','in','is','on'])) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS stopword_ratio
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "json_extract_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS min_k,
        |  MAX(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin
  )
}

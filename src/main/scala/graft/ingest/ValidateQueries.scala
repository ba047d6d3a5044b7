package graft.ingest

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-gated queries exercising the validation rules (P5–P8) and the
  * scalar-function surface (F5–F10, F12, F15) over the driver fixtures.
  */
object ValidateQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P5+P6+P7+P8+F6+F7+F8: the whole cleaning rule-set in one pass over
    // events — a single narrow codegen stage, no shuffle.
    "p5_p8_validate_events" -> ((s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          col("user_id").cast("string").as("user_id"),          // F6
          lower(trim(col("event_type"))).as("event_type"),      // F7
          col("value"),
          coalesce(col("value").cast("int"), lit(0)).as("value_int"), // F8
          get_json_object(col("props"), "$.k").cast("int").as("props_k"), // P7 cast-or-null
          to_date(col("ts")).cast("string").as("date"))          // P8/F1
        .na.drop(Seq("event_id", "user_id", "date"))            // P5
        .filter(col("value").between(0.0, 400.0))               // P6
        .filter(col("props_k").isNotNull)),                     // P7 keep parseable
        // no terminal sort: the cleaning pass stays one narrow codegen
        // stage (verification hashing is row-order-independent; a
        // corpus-wide orderBy here was pure shuffle cost at scale)

    // A5: data-quality null-indicator counts (validate.py:118) — how
    // many rows each cleaning rule would drop, in one scan.
    "a5_quality_counts" -> ((s, d) =>
      Tables.events(s, d)
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("user_id").isNull, 1).otherwise(0)).as("n_null_user"),
          sum(when(col("ts").isNull, 1).otherwise(0)).as("n_null_ts"),
          sum(when(get_json_object(col("props"), "$.k").isNull, 1).otherwise(0))
            .as("n_bad_props"),
          sum(when(!col("value").between(0.0, 400.0), 1).otherwise(0))
            .as("n_out_of_range"))),

    // Table profiling: per-column non-null/distinct counts in ONE scan
    // (the pre-flight data-quality pass every pipeline runs on a new
    // drop). Exact distincts here for the gate; at 100 TB the same
    // shape runs approx_count_distinct to avoid the 4-way Expand.
    "profile_documents" -> ((s, d) => {
      val agg = Tables.documents(s, d).agg(
        count(col("doc_id")).as("nn_doc_id"),
        countDistinct(col("doc_id")).as("nd_doc_id"),
        count(col("lang")).as("nn_lang"),
        countDistinct(col("lang")).as("nd_lang"),
        count(col("source")).as("nn_source"),
        countDistinct(col("source")).as("nd_source"),
        count(col("text")).as("nn_text"),
        countDistinct(col("text")).as("nd_text"))
      agg.select(expr(
        """stack(4,
          |'doc_id', nn_doc_id, nd_doc_id,
          |'lang', nn_lang, nd_lang,
          |'source', nn_source, nd_source,
          |'text', nn_text, nd_text) as (col_name, n_nonnull, n_distinct)""".stripMargin))
        .orderBy(col("col_name"))
    }),

    // F9+F10: composite serving-key construction (concat_ws / printf).
    "f9_f10_key_concat" -> ((s, d) =>
      Tables.nation(s, d)
        .select(
          concat_ws("#", lit("NATION"), col("n_name"), lit("REGION"),
            col("n_regionkey").cast("string")).as("pk"),
          format_string("KEY#%03d#%s", col("n_nationkey"), lower(trim(col("n_name")))).as("sk"),
          regexp_replace(col("n_name"), "A", "_").as("masked"))  // F15
        .orderBy(col("sk")))
  )

  val oracles: Map[String, String] = Map(
    "p5_p8_validate_events" ->
      """SELECT event_id, CAST(user_id AS VARCHAR) AS user_id,
        |  LOWER(TRIM(event_type)) AS event_type, value,
        |  COALESCE(CAST(FLOOR(value) AS INT), 0) AS value_int,
        |  CAST(regexp_extract(props, '[0-9]+') AS INT) AS props_k,
        |  CAST(CAST(ts AS DATE) AS VARCHAR) AS date
        |FROM events
        |WHERE event_id IS NOT NULL AND user_id IS NOT NULL AND ts IS NOT NULL
        |  AND value BETWEEN 0.0 AND 400.0
        |  AND regexp_extract(props, '[0-9]+') <> ''""".stripMargin,

    "a5_quality_counts" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_user,
        |  CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_ts,
        |  CAST(SUM(CASE WHEN regexp_extract(props, '[0-9]+') = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_props,
        |  CAST(SUM(CASE WHEN value NOT BETWEEN 0.0 AND 400.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_out_of_range
        |FROM events""".stripMargin,

    "profile_documents" ->
      """SELECT 'doc_id' AS col_name, COUNT(doc_id) AS n_nonnull,
        |  COUNT(DISTINCT doc_id) AS n_distinct FROM documents
        |UNION ALL SELECT 'lang', COUNT(lang), COUNT(DISTINCT lang) FROM documents
        |UNION ALL SELECT 'source', COUNT(source), COUNT(DISTINCT source) FROM documents
        |UNION ALL SELECT 'text', COUNT(text), COUNT(DISTINCT text) FROM documents
        |ORDER BY col_name""".stripMargin,

    "f9_f10_key_concat" ->
      """SELECT
        |  'NATION#' || n_name || '#REGION#' || CAST(n_regionkey AS VARCHAR) AS pk,
        |  printf('KEY#%03d#%s', n_nationkey, LOWER(TRIM(n_name))) AS sk,
        |  regexp_replace(n_name, 'A', '_', 'g') AS masked
        |FROM nation
        |ORDER BY sk""".stripMargin
  )
}

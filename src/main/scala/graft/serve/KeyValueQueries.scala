package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** R1–R3 reshape queries plus the three `queries/dynamo_query.txt` lookup
  * families (§2.10) as predicates over the serving table: exact pk +
  * `begins_with(sk)`, exact sk, and `BETWEEN` on sk.
  */
object KeyValueQueries {

  // Shared oracle CTE: the serving table rebuilt in ANSI SQL.
  private val servingCte =
    """WITH enriched AS (
      |  SELECT e.event_type, CAST(e.ts AS DATE) AS date, e.user_id, e.value
      |  FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |), kpis AS (
      |  SELECT event_type, date,
      |    COUNT(*) AS listen_count,
      |    COUNT(DISTINCT user_id) AS unique_listeners,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS avg_value
      |  FROM enriched GROUP BY 1, 2
      |), kpi_items AS (
      |  SELECT 'GENRE#' || event_type || '#DATE#' || CAST(date AS VARCHAR) AS pk,
      |         'METRIC#' || metric_type AS sk, value, 'genre_metric' AS record_type
      |  FROM (
      |    SELECT event_type, date, 'listen_count' AS metric_type,
      |           CAST(listen_count AS VARCHAR) AS value FROM kpis
      |    UNION ALL
      |    SELECT event_type, date, 'unique_listeners',
      |           CAST(unique_listeners AS VARCHAR) FROM kpis
      |    UNION ALL
      |    SELECT event_type, date, 'total_value',
      |           CAST(CAST(total_value AS DECIMAL(28,6)) AS VARCHAR) FROM kpis
      |    UNION ALL
      |    SELECT event_type, date, 'avg_value',
      |           CAST(CAST(avg_value AS DECIMAL(28,6)) AS VARCHAR) FROM kpis
      |  )
      |), song_items AS (
      |  SELECT 'GENRE#' || l_returnflag || '#DATE#' || CAST(date AS VARCHAR) AS pk,
      |         printf('SONG#%d#%d', rank, l_partkey) AS sk,
      |         CAST(play_count AS VARCHAR) AS value, 'top_song' AS record_type
      |  FROM (
      |    SELECT l_returnflag, date, l_partkey, play_count,
      |      ROW_NUMBER() OVER (PARTITION BY l_returnflag, date
      |                         ORDER BY play_count DESC, l_partkey ASC) AS rank
      |    FROM (SELECT l_returnflag, CAST(l_shipdate AS DATE) AS date, l_partkey,
      |            COUNT(*) AS play_count FROM lineitem GROUP BY 1, 2, 3)
      |  ) WHERE rank <= 3
      |), genre_items AS (
      |  SELECT 'DATE#' || CAST(date AS VARCHAR) AS pk,
      |         printf('GENRE_RANK#%d', rank) AS sk,
      |         event_type AS value, 'top_genre' AS record_type
      |  FROM (
      |    SELECT date, event_type, total_plays,
      |      ROW_NUMBER() OVER (PARTITION BY date
      |                         ORDER BY total_plays DESC, event_type ASC) AS rank
      |    FROM (SELECT CAST(ts AS DATE) AS date, event_type, COUNT(*) AS total_plays
      |          FROM events GROUP BY 1, 2)
      |  ) WHERE rank <= 5
      |), serving AS (
      |  SELECT * FROM kpi_items
      |  UNION ALL SELECT * FROM song_items
      |  UNION ALL SELECT * FROM genre_items
      |)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // R1: the unpivoted metric items (served from the materialized
    // store — one build, many reads, like the reference's DynamoDB).
    "r1_unpivot_kpis" -> ((s, d) =>
      KeyValue.servingTableCached(s, d)
        .filter(col("record_type") === "genre_metric")
        .orderBy(col("pk"), col("sk"))),

    // R2+R3: the two rank-item projections, unioned.
    "r2_r3_rank_items" -> ((s, d) =>
      KeyValue.servingTableCached(s, d)
        .filter(col("record_type").isin("top_song", "top_genre"))
        .orderBy(col("pk"), col("sk"))),

    // §2.10 lookup family 1: pk prefix + exact metric sk
    // (dynamo_query.txt:3-24).
    "l1_metric_lookup" -> ((s, d) =>
      KeyValue.servingTableCached(s, d)
        .filter(col("pk").startsWith("GENRE#click#") && col("sk") === "METRIC#listen_count")
        .orderBy(col("pk"), col("sk"))),

    // Family 1 served from the INCREMENTAL day-partitioned store
    // (KeyValue.ensureStoreDaily) — same oracle as l1: the O(changed
    // days) refresh lifecycle must be content-identical to the full
    // build, and this keeps that claim under the hash gate, not just
    // the spec.
    "l1_metric_lookup_daily" -> ((s, d) =>
      KeyValue.dailyStoreCached(s, d)
        .filter(col("pk").startsWith("GENRE#click#") && col("sk") === "METRIC#listen_count")
        .orderBy(col("pk"), col("sk"))),

    // Lookup family 2: pk prefix + begins_with(sk, 'SONG#1#') — the
    // rank-1 song per genre-day (dynamo_query.txt:26-47).
    "l2_top_song_lookup" -> ((s, d) =>
      KeyValue.servingTableCached(s, d)
        .filter(col("pk").startsWith("GENRE#A#") && col("sk").startsWith("SONG#1#"))
        .orderBy(col("pk"), col("sk"))),

    // Lookup family 3: exact pk (earliest event day) + sk BETWEEN
    // (dynamo_query.txt:49-70). The earliest day is computed in-plan
    // (1-row aggregate broadcast-joined onto the store) rather than
    // fetched to the driver with .head() — one job instead of two.
    "l3_rank_between_lookup" -> ((s, d) => {
      val minPk = graft.Tables.events(s, d)
        .agg(concat(lit("DATE#"), min(to_date(col("ts"))).cast("string")).as("_pk"))
      KeyValue.servingTableCached(s, d)
        .join(broadcast(minPk), col("pk") === col("_pk"))
        .drop("_pk")
        .filter(col("sk").between("GENRE_RANK#1", "GENRE_RANK#3"))
        .orderBy(col("pk"), col("sk"))
    }),

    // Lookup family 4 (beyond the reference's three): the media
    // corpus's per-day language profile served as key lookups —
    // pk prefix MEDIA#en# + exact metric sk (the en pixel-volume time
    // series), through the INCREMENTAL day-partitioned store, so media
    // rows ride the same O(changed-days) refresh lifecycle as the
    // music KPIs. Values come from the decode-once feature store;
    // the oracle replays them generatively.
    "l4_media_profile_lookup" -> ((s, d) =>
      KeyValue.dailyStoreCached(s, d)
        .filter(col("pk").startsWith("MEDIA#en#") &&
          col("sk") === "METRIC#px_total")
        .orderBy(col("pk"), col("sk"))),

    // K5: keyed upsert snapshot — the batch analogue of the reference's
    // DynamoDB overwrite-by-pk ingestion (dynamodb-ingestion.py
    // batch_writer: the last write per key wins). A correction batch is
    // unioned with the base and the latest version per key survives
    // (one window pass, WindowGroupLimit-capped); at 100 TB this runs
    // per date-partition via Layout.mergeDaily rather than over the
    // whole table.
    "k5_upsert_snapshot" -> ((s, d) => {
      val base = graft.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("version", lit(0))
      val updates = base.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(10.0))
        .withColumn("version", lit(1))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderkey")).orderBy(col("version").desc)
      base.unionByName(updates)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          graft.Tables.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderstatus"))
    })
  )

  val oracles: Map[String, String] = Map(
    "k5_upsert_snapshot" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS version
        |  FROM orders
        |), updates AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice + 10.0 AS o_totalprice,
        |    1 AS version
        |  FROM orders WHERE o_orderkey % 7 = 0
        |), merged AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
        |    ORDER BY version DESC) AS rn
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM updates)
        |)
        |SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM merged WHERE rn = 1
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "r1_unpivot_kpis" ->
      (servingCte + "\nSELECT * FROM kpi_items ORDER BY pk, sk"),
    "r2_r3_rank_items" ->
      (servingCte +
        "\nSELECT * FROM (SELECT * FROM song_items UNION ALL SELECT * FROM genre_items) ORDER BY pk, sk"),
    "l1_metric_lookup" ->
      (servingCte +
        "\nSELECT * FROM serving WHERE pk LIKE 'GENRE#click#%' AND sk = 'METRIC#listen_count' ORDER BY pk, sk"),
    "l1_metric_lookup_daily" ->
      (servingCte +
        "\nSELECT * FROM serving WHERE pk LIKE 'GENRE#click#%' AND sk = 'METRIC#listen_count' ORDER BY pk, sk"),
    "l2_top_song_lookup" ->
      (servingCte +
        "\nSELECT * FROM serving WHERE pk LIKE 'GENRE#A#%' AND sk LIKE 'SONG#1#%' ORDER BY pk, sk"),
    "l3_rank_between_lookup" ->
      (servingCte +
        """
          |SELECT * FROM serving
          |WHERE pk = 'DATE#' || CAST((SELECT MIN(CAST(ts AS DATE)) FROM events) AS VARCHAR)
          |  AND sk BETWEEN 'GENRE_RANK#1' AND 'GENRE_RANK#3'
          |ORDER BY pk, sk""".stripMargin),

    // Media profile replay: the mm_multimodal_profile generative body
    // (image pixel volume from the metadata formula; audio peak from
    // the full sample replay; video luma from the full byte replay),
    // grouped by (lang, derived ingest day), reshaped to the MEDIA#
    // item family and filtered like the engine's lookup.
    "l4_media_profile_lookup" ->
      """WITH au AS (
        |  SELECT doc_id,
        |    (doc_id + 3) * 2654435761 % 4294967296 % 2048 + 256 AS frames,
        |    (doc_id + 4) * 2654435761 % 4294967296 % 2 + 1 AS channels,
        |    ((doc_id + 5) * 2654435761 % 4294967296 % 2 + 1) * 8000 AS rate
        |  FROM documents
        |), ap AS (
        |  SELECT doc_id, frames * 1000 // rate AS audio_ms,
        |    MAX(abs((doc_id + k * 2654435761) % 65536 - 32768)) AS apeak
        |  FROM (SELECT doc_id, frames, rate,
        |          unnest(generate_series(0, CAST(frames * channels - 1 AS BIGINT))) AS k
        |        FROM au) GROUP BY 1, 2
        |), vm AS (
        |  SELECT doc_id,
        |    (doc_id + 6) * 2654435761 % 4294967296 % 32 + 16 AS w,
        |    (doc_id + 7) * 2654435761 % 4294967296 % 32 + 16 AS h,
        |    (doc_id + 8) * 2654435761 % 4294967296 % 8 + 2 AS nf
        |  FROM documents
        |), vv AS (
        |  SELECT doc_id, nf,
        |    SUM(CASE WHEN (j % (w * h * 3)) // (w * h) = 0
        |        THEN (doc_id + j * 2654435761) % 256 ELSE 0 END) AS vy
        |  FROM (SELECT doc_id, w, h, nf,
        |          unnest(generate_series(0, CAST(nf * w * h * 3 - 1 AS BIGINT))) AS j
        |        FROM vm) GROUP BY 1, 2
        |), im AS (
        |  SELECT doc_id,
        |    ((doc_id + 0) * 2654435761 % 4294967296 % 64 + 32)
        |    * ((doc_id + 1) * 2654435761 % 4294967296 % 64 + 32) AS px
        |  FROM documents
        |), prof AS (
        |  SELECT d.lang,
        |    CAST(DATE '2024-01-01' + CAST(d.doc_id % 7 AS INTEGER) AS VARCHAR)
        |      AS day,
        |    CAST(SUM(im.px) AS BIGINT) AS px_total
        |  FROM documents d
        |  JOIN im USING (doc_id) JOIN ap USING (doc_id) JOIN vv USING (doc_id)
        |  GROUP BY 1, 2
        |)
        |SELECT 'MEDIA#' || lang || '#DATE#' || day AS pk,
        |  'METRIC#px_total' AS sk,
        |  CAST(px_total AS VARCHAR) AS value,
        |  'media_profile' AS record_type
        |FROM prof WHERE lang = 'en'
        |ORDER BY pk, sk""".stripMargin
  )
}

package graft.serve

import graft.analytics.{Enrich, Kpis}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's DynamoDB single-table projection re-expressed as a
  * sorted `(pk, sk)` relational table (`glue_jobs/dynamodb-ingestion.py`
  * R1–R3; key schema `README.md:121-129`; query surface
  * `queries/dynamo_query.txt`).
  *
  * The reference reshapes with pandas `iterrows()` (scalar, single
  * process); here each reshape is a projection/unpivot the optimizer can
  * pipeline, and the "table" is just a DataFrame that would be written
  * sorted by (pk, sk) so serving predicates prune parquet row groups.
  *
  * Numeric values are stringified through DECIMAL(28,6) so Spark and the
  * DuckDB oracle render identical text (raw double→string formatting is
  * not portable across engines).
  */
object KeyValue {

  private def dateStr(c: String) = col(c).cast("string")

  /** R1: wide genre-KPI row → 4 (pk, sk, value) metric items
    * (`dynamodb-ingestion.py:46-79`). Spark-native unpivot via `stack`.
    */
  def kpiItems(genreKpis: DataFrame): DataFrame =
    genreKpis
      .select(
        concat_ws("#", lit("GENRE"), col("event_type"), lit("DATE"), dateStr("date")).as("pk"),
        expr(
          """stack(4,
            |  'listen_count',       CAST(listen_count AS STRING),
            |  'unique_listeners',   CAST(unique_listeners AS STRING),
            |  'total_value',        CAST(CAST(total_value AS DECIMAL(28,6)) AS STRING),
            |  'avg_value',          CAST(CAST(avg_value AS DECIMAL(28,6)) AS STRING)
            |) AS (metric_type, value)""".stripMargin))
      .select(col("pk"), concat(lit("METRIC#"), col("metric_type")).as("sk"),
        col("value"), lit("genre_metric").as("record_type"))

  /** R2: top-song rows → items keyed `SONG#<rank>#<id>`
    * (`dynamodb-ingestion.py:81-106`).
    */
  def topSongItems(topSongs: DataFrame): DataFrame =
    topSongs.select(
      concat_ws("#", lit("GENRE"), col("l_returnflag"), lit("DATE"), dateStr("date")).as("pk"),
      format_string("SONG#%d#%d", col("rank"), col("l_partkey")).as("sk"),
      col("play_count").cast("string").as("value"),
      lit("top_song").as("record_type"))

  /** R3: top-genre rows → items keyed `GENRE_RANK#<rank>` under a
    * date-only pk (`dynamodb-ingestion.py:108-131`).
    */
  def topGenreItems(topGenres: DataFrame): DataFrame =
    topGenres.select(
      concat_ws("#", lit("DATE"), dateStr("date")).as("pk"),
      format_string("GENRE_RANK#%d", col("rank")).as("sk"),
      col("event_type").as("value"),
      lit("top_genre").as("record_type"))

  /** R4 (beyond the reference's three families): the media corpus's
    * per-day language profile as serving items, keyed
    * `MEDIA#<lang>#DATE#<d>` / `METRIC#<name>` — so the media family's
    * daily card is a key lookup like every other §2.10 read, not an
    * aggregation at query time. Measures are SERVED from the decode-once
    * feature store (one slim doc_id join — no payload access, the
    * [[graft.ext.MediaFeatures.profileStored]] shape), sliced per ingest
    * day. The fixture corpus carries no ingest date, so [[docDay]]
    * derives a deterministic 7-day calendar from doc_id — the stand-in
    * for the arrival date a real pipeline's manifest provides — which
    * keeps every value SQL-replayable. The family exists only when the
    * corpus table does (a music-only deployment serves the original
    * three families untouched).
    */
  private[graft] def docDay(docId: Column): Column =
    date_add(lit("2024-01-01").cast("date"), pmod(docId, lit(7)).cast("int"))

  private[graft] def hasDocs(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def mediaProfileItems(spark: SparkSession, dir: String,
                        days: Option[Seq[String]] = None): DataFrame = {
    import graft.ext.MediaFeatures
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        docDay(col("doc_id")).cast("string").as("day"))
    val scoped = days.fold(docs)(ds => docs.filter(col("day").isin(ds: _*)))
    val feats = MediaFeatures.features(spark,
        MediaFeatures.ensure(spark, graft.Tables.documents(spark, dir),
          MediaFeatures.defaultDir(dir)))
      .select(col("doc_id"), (col("img_w") * col("img_h")).as("px"),
        col("a_ms"), col("a_peak"), col("v_frames"), col("y_sum"))
      .filter(col("px").isNotNull && col("a_ms").isNotNull &&
        col("v_frames").isNotNull)
    scoped.join(feats, "doc_id")
      .groupBy(col("lang"), col("day"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("px")).as("px_total"),
        sum(col("a_ms")).as("audio_ms_total"),
        max(col("a_peak")).as("audio_peak_max"),
        sum(col("v_frames")).as("video_frames_total"),
        sum(col("y_sum")).as("video_y_total"))
      .select(
        concat_ws("#", lit("MEDIA"), col("lang"), lit("DATE"), col("day")).as("pk"),
        expr(
          """stack(6,
            |  'n_docs',              CAST(n_docs AS STRING),
            |  'px_total',            CAST(px_total AS STRING),
            |  'audio_ms_total',      CAST(audio_ms_total AS STRING),
            |  'audio_peak_max',      CAST(audio_peak_max AS STRING),
            |  'video_frames_total',  CAST(video_frames_total AS STRING),
            |  'video_y_total',       CAST(video_y_total AS STRING)
            |) AS (metric_type, value)""".stripMargin))
      .select(col("pk"), concat(lit("METRIC#"), col("metric_type")).as("sk"),
        col("value"), lit("media_profile").as("record_type"))
  }

  /** The full serving table: union of all item families (the three
    * reference projections plus the media profile when a corpus table
    * exists), sorted by (pk, sk) — the layout that makes §2.10 lookups
    * row-group-prunable.
    */
  def servingTable(spark: SparkSession, dir: String): DataFrame = {
    val kpis = Kpis.genreKpis(Enrich.enriched(spark, dir))
    val base = kpiItems(kpis)
      .unionByName(topSongItems(Kpis.topPartsPerFlagDay(spark, dir)))
      .unionByName(topGenreItems(Kpis.topTypesPerDay(spark, dir)))
    if (hasDocs(spark, dir)) base.unionByName(mediaProfileItems(spark, dir))
    else base
  }

  /** The serving store at rest: the table written range-partitioned and
    * sorted by (pk, sk) as parquet, fingerprint-guarded like the ANN
    * indexes and the near-dup pair table ([[graft.ext.Artifact]]) — the
    * literal analog of the reference's *loaded* DynamoDB table
    * (`dynamodb-ingestion.py` runs once per batch; reads hit the store).
    * Sorted files mean the §2.10 lookup predicates prune parquet row
    * groups on pk/sk min/max. Freshness is a file-level fingerprint of
    * the three source tables the projections read (events, customer,
    * lineitem) — no data scanned, rebuild on any file change.
    */
  def ensureStore(spark: SparkSession, dir: String): String = {
    import graft.ext.Artifact
    val srcs = Seq(s"$dir/events.parquet", s"$dir/customer.parquet",
      s"$dir/lineitem.parquet") ++
      (if (hasDocs(spark, dir)) Seq(s"$dir/documents.parquet") else Nil)
    val fp = Artifact.fileFingerprint(spark, srcs: _*)
    val root = s"${Artifact.root(dir)}/serving"
    Artifact.ensure(spark, root, s"serving v1 fp=$fp") {
      servingTable(spark, dir)
        .repartitionByRange(4, col("pk"), col("sk"))
        .sortWithinPartitions(col("pk"), col("sk"))
        .write.mode("overwrite").parquet(s"$root/store")
    }
    s"$root/store"
  }

  // ------------------- incremental (day-partitioned) serving store

  /** The day of a serving item, parsed back out of its pk — all three
    * item families encode it as `DATE#<yyyy-MM-dd>`.
    */
  private def dayOf(pk: Column): Column =
    regexp_extract(pk, "DATE#([0-9]{4}-[0-9]{2}-[0-9]{2})", 1)

  /** Per-day content fingerprints of the DATE-BEARING serving inputs:
    * `(d, ev_n, ev_h, li_n, li_h, doc_n, doc_h)` — count +
    * order-independent hash-sum per day, one narrow scan each (with a
    * date-partitioned fact table these scans prune to the partitions
    * that changed). The corpus table's per-day slice keys on the
    * derived ingest day ([[docDay]]); zeros when no corpus table
    * exists. The non-date input (customer) gets a single file-level
    * fingerprint in the store metadata instead: a dimension change
    * invalidates every day.
    */
  def dayFingerprints(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).cast("string").as("d"))
      .agg(count(lit(1)).as("ev_n"),
        sum(xxhash64(col("event_type"), col("ts"), col("user_id"), col("value"))).as("ev_h"))
    val li = graft.Tables.lineitem(spark, dir)
      .groupBy(to_date(col("l_shipdate")).cast("string").as("d"))
      .agg(count(lit(1)).as("li_n"),
        sum(xxhash64(col("l_returnflag"), col("l_shipdate"), col("l_partkey"))).as("li_h"))
    val joined =
      if (!hasDocs(spark, dir))
        ev.join(li, Seq("d"), "full_outer")
          .withColumn("doc_n", lit(0L)).withColumn("doc_h", lit(0L))
      else ev.join(li, Seq("d"), "full_outer")
        .join(graft.Tables.documents(spark, dir)
          .groupBy(docDay(col("doc_id")).cast("string").as("d"))
          .agg(count(lit(1)).as("doc_n"),
            sum(xxhash64(col("doc_id"), col("lang"))).as("doc_h")),
          Seq("d"), "full_outer")
    joined.select(col("d"),
      coalesce(col("ev_n"), lit(0L)).as("ev_n"), coalesce(col("ev_h"), lit(0L)).as("ev_h"),
      coalesce(col("li_n"), lit(0L)).as("li_n"), coalesce(col("li_h"), lit(0L)).as("li_h"),
      coalesce(col("doc_n"), lit(0L)).as("doc_n"), coalesce(col("doc_h"), lit(0L)).as("doc_h"))
  }

  /** The serving table scoped to the given days. Every item family is
    * day-local (each aggregation and ranking window partitions on the
    * date), so the day-sliced computation produces exactly the same
    * rows as the same days of a full run — the property that makes
    * per-day refresh EXACT, not approximate. Filters sit on the scans,
    * so date-partitioned facts prune at the source.
    */
  def servingTableForDays(spark: SparkSession, dir: String, days: Seq[String]): DataFrame = {
    val enrichedD = Enrich.enriched(spark, dir)
      .filter(col("date").cast("string").isin(days: _*))
    val base = kpiItems(Kpis.genreKpis(enrichedD))
      .unionByName(topSongItems(Kpis.topPartsPerFlagDay(spark, dir, days = Some(days))))
      .unionByName(topGenreItems(Kpis.topTypesPerDay(spark, dir, days = Some(days))))
    if (hasDocs(spark, dir))
      base.unionByName(mediaProfileItems(spark, dir, Some(days)))
    else base
  }

  /** The incremental serving store: day-partitioned at rest
    * (`store/d=<date>/`, each day's file sorted by (pk, sk)), refreshed
    * per day — the O(changed-days) lifecycle the full-rebuild
    * [[ensureStore]] lacks, and the at-rest analog of the reference's
    * nightly DynamoDB upsert (`dynamodb-ingestion.py` writes one
    * processing day's items; history is never recomputed).
    *
    * Freshness: a `daymeta/` sidecar stores each day's input
    * fingerprint ([[dayFingerprints]]); on ensure, changed or new days
    * are recomputed and swapped in via dynamic partition overwrite,
    * days that vanished from the inputs are dropped, and untouched days
    * are NOT rewritten (spec-asserted by file mtimes). A customer
    * (dimension) change invalidates everything — its file fingerprint
    * lives in the metadata line. Mutations run under the pending
    * marker; a crash mid-refresh forces a full rebuild.
    */
  def ensureStoreDaily(spark: SparkSession, dir: String): String = {
    import graft.ext.Artifact
    val root = s"${Artifact.root(dir)}/serving_daily"
    val storePath = s"$root/store"
    // v2: the day fingerprint grew the corpus columns (media items) —
    // the version bump rebuilds any v1 store instead of misreading its
    // narrower daymeta schema
    val metaLine = s"serving-daily v2 cust=${Artifact.fileFingerprint(spark, s"$dir/customer.parquet")}"

    // FILE-LEVEL fast path before any data scan: the per-day CONTENT
    // fingerprints below cost three aggregation passes over the full
    // fact/corpus tables — the right freshness check after a mutation,
    // but 4+ s of every warm phase on an untouched fixture. If the
    // source FILES are byte-level unchanged (same paths/sizes/mtimes —
    // the same evidence ensureStore trusts), day contents cannot have
    // changed and the store serves as-is.
    val srcFpPath = new org.apache.hadoop.fs.Path(s"$root/srcmeta")
    val srcFs = srcFpPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val srcFp = Artifact.fileFingerprint(spark,
      (Seq(s"$dir/events.parquet", s"$dir/lineitem.parquet") ++
        (if (hasDocs(spark, dir)) Seq(s"$dir/documents.parquet") else Nil)): _*)
    def readSrcFp: Option[String] =
      if (!srcFs.exists(srcFpPath)) None
      else {
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(srcFs.open(srcFpPath)))
        try Option(in.readLine()).map(_.trim) finally in.close()
      }
    def writeSrcFp(): Unit = {
      val out = srcFs.create(srcFpPath, true)
      try out.write(srcFp.getBytes("UTF-8")) finally out.close()
    }
    // The srcmeta match alone is not evidence the STORE survived: a
    // partially deleted root (store or daymeta removed, srcmeta left)
    // would be served as fresh and fail only at read time — and
    // writeSrcFp() at the bottom re-arms the fast path even on the
    // incremental branch, making the broken state sticky. Require both
    // directories to still exist, else fall back to the fingerprint scan
    // (whose full-rebuild branch recreates them).
    if (!Artifact.hasPendingMutation(spark, root) &&
        Artifact.readMeta(spark, root).contains(metaLine) &&
        readSrcFp.contains(srcFp) &&
        srcFs.exists(new org.apache.hadoop.fs.Path(storePath)) &&
        srcFs.exists(new org.apache.hadoop.fs.Path(s"$root/daymeta")))
      return storePath

    val current = dayFingerprints(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))
      .toMap

    def writeAllDays(days: Seq[String]): Unit =
      servingTableForDays(spark, dir, days)
        .withColumn("d", dayOf(col("pk")))
        .repartition(col("d"))
        .sortWithinPartitions(col("d"), col("pk"), col("sk"))
        .write.partitionBy("d")
        .mode("overwrite").parquet(storePath)
    def writeDayMeta(): Unit =
      spark.createDataFrame(current.toSeq.map {
          case (d, (a, b, c2, e, f, g)) => (d, a, b, c2, e, f, g) })
        .toDF("d", "ev_n", "ev_h", "li_n", "li_h", "doc_n", "doc_h")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/daymeta")

    if (Artifact.hasPendingMutation(spark, root) ||
        !Artifact.readMeta(spark, root).contains(metaLine) ||
        !srcFs.exists(new org.apache.hadoop.fs.Path(storePath)) ||
        !srcFs.exists(new org.apache.hadoop.fs.Path(s"$root/daymeta"))) {
      // full (re)build: dimension changed, first build, crashed refresh,
      // or a partially deleted root (the incremental branch below READS
      // daymeta, so a missing directory must land here, not there)
      writeAllDays(current.keys.toSeq.sorted)
      writeDayMeta()
      Artifact.endMutation(spark, root)
      Artifact.writeMeta(spark, root, metaLine)
    } else {
      val stored = spark.read.parquet(s"$root/daymeta").collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5), r.getLong(6)))
        .toMap
      val changed = current.filter { case (d, fp) => stored.get(d) != Some(fp) }.keys.toSeq.sorted
      val removed = (stored.keySet -- current.keySet).toSeq.sorted
      if (changed.nonEmpty || removed.nonEmpty) {
        Artifact.beginMutation(spark, root)
        // A changed day whose recomputed output is EMPTY (e.g. every
        // event of the day drops out of the enrichment join) writes no
        // partition under dynamic overwrite — its stale directory must be
        // deleted explicitly or the old items serve forever. One
        // materialization of the (changed-days-only) output feeds both
        // the write and the written-day set.
        val emptied = if (changed.isEmpty) Nil else {
          val out = servingTableForDays(spark, dir, changed)
            .withColumn("d", dayOf(col("pk"))).localCheckpoint()
          out.repartition(col("d"))
            .sortWithinPartitions(col("d"), col("pk"), col("sk"))
            .write.partitionBy("d").option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(storePath)
          val written = out.select(col("d")).distinct()
            .collect().map(_.getString(0)).toSet
          changed.filterNot(written)
        }
        val stale = removed ++ emptied.filter(stored.contains)
        if (stale.nonEmpty) {
          val p = new org.apache.hadoop.fs.Path(storePath)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          stale.foreach(d =>
            fs.delete(new org.apache.hadoop.fs.Path(s"$storePath/d=$d"), true))
        }
        writeDayMeta()
        Artifact.endMutation(spark, root)
      }
    }
    writeSrcFp() // the file-level fast path re-arms after any outcome
    storePath
  }

  /** Read side of [[ensureStoreDaily]]: the serving columns, day
    * partitions dropped (`d` is layout, not data).
    */
  def loadDailyStore(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(ensureStoreDaily(spark, dir))
      .select(col("pk"), col("sk"), col("value"), col("record_type"))

  /** [[loadDailyStore]] with load-once semantics per session, like
    * [[servingTableCached]]: the freshness check (two narrow per-day
    * fingerprint scans) and the partition-directory listing run once,
    * not per query — the day layout means MANY directories, and
    * re-listing them per lookup would dominate serve cost.
    */
  def dailyStoreCached(spark: SparkSession, dir: String): DataFrame =
    cached(spark, s"daily:$dir") {
      val df = loadDailyStore(spark, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }

  /** Drop the session's load-once store materializations for `dir` —
    * the streaming refresh path ([[graft.stream.ServingIngest]]) calls
    * this after mutating the fact table so the NEXT lookup reloads the
    * refreshed store instead of serving the pinned pre-mutation plan.
    */
  private[graft] def invalidate(spark: SparkSession, dir: String): Unit = {
    val perSession = cache.synchronized { cache.get(spark) }
    if (perSession != null)
      Seq(dir, s"daily:$dir").foreach { k =>
        val df = perSession.remove(k)
        if (df != null) df.unpersist()
      }
  }

  // Weak keys: entries die with their SparkSession (no identity-hash
  // collisions, no pinning of plans for stopped sessions).
  private val cache =
    new java.util.WeakHashMap[SparkSession, java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  private def cached(spark: SparkSession, key: String)(load: => DataFrame): DataFrame = {
    val perSession = cache.synchronized {
      cache.computeIfAbsent(spark,
        _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
    }
    perSession.computeIfAbsent(key, _ => load)
  }

  /** In-session view of the persisted store ([[ensureStore]]): read from
    * the sorted parquet and memory-persisted, so the lookup families
    * scan a loaded store instead of re-running enrich+aggregate per
    * query — and a fresh session pays only the fingerprint check + load,
    * not the build.
    */
  def servingTableCached(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir) {
      val df = spark.read.parquet(ensureStore(spark, dir))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count() // materialize eagerly — this is the "load" step
      df
    }
}

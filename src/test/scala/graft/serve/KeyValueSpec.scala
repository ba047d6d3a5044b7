package graft.serve

import graft.SparkSuite
import graft.analytics.{Enrich, Kpis}
import org.apache.spark.sql.functions._

class KeyValueSpec extends SparkSuite {
  import spark.implicits._

  test("R1: unpivot yields exactly 4 metric rows per KPI row") {
    val kpis = Kpis.genreKpis(Enrich.enriched(spark, sfDir))
    val items = KeyValue.kpiItems(kpis)
    assert(items.count() == kpis.count() * 4)
    val metrics = items.select("sk").distinct().as[String].collect().toSet
    assert(metrics == Set("METRIC#listen_count", "METRIC#unique_listeners",
      "METRIC#total_value", "METRIC#avg_value"))
  }

  test("R1: pk follows GENRE#<g>#DATE#<yyyy-MM-dd>") {
    val kpis = Kpis.genreKpis(Enrich.enriched(spark, sfDir))
    val bad = KeyValue.kpiItems(kpis)
      .filter(!col("pk").rlike("^GENRE#[a-z]+#DATE#\\d{4}-\\d{2}-\\d{2}$"))
    assert(bad.isEmpty)
  }

  test("R2/R3: sk encodes rank; values are stringified") {
    val songs = KeyValue.topSongItems(Kpis.topPartsPerFlagDay(spark, sfDir))
    assert(songs.filter(!col("sk").rlike("^SONG#[1-3]#\\d+$")).isEmpty)
    val genres = KeyValue.topGenreItems(Kpis.topTypesPerDay(spark, sfDir))
    assert(genres.filter(!col("sk").rlike("^GENRE_RANK#[1-5]$")).isEmpty)
    assert(genres.schema("value").dataType.typeName == "string")
  }

  test("persisted serving store equals the live projection; load-once per fingerprint") {
    deleteRecursively(graft.ext.Artifact.root(sfDir))
    val storePath = KeyValue.ensureStore(spark, sfDir)
    val live = KeyValue.servingTable(spark, sfDir)
      .as[(String, String, String, String)].collect().toSet
    val stored = spark.read.parquet(storePath)
      .as[(String, String, String, String)].collect().toSet
    assert(stored == live, "store at rest must equal the live projection")
    val marker = new java.io.File(s"$storePath/_SUCCESS")
    val t1 = marker.lastModified()
    KeyValue.ensureStore(spark, sfDir)
    assert(marker.lastModified() == t1, "unchanged sources must not rebuild the store")
  }

  test("§2.10: begins_with + between predicates select consistent slices") {
    val serving = KeyValue.servingTable(spark, sfDir).cache()
    try {
      // METRIC# items come in fixed-width families: 4 per genre-KPI
      // row (R1), 6 per media-profile (lang, day) row (R4)
      val metricRows = serving.filter(col("sk").startsWith("METRIC#") &&
        col("record_type") === "genre_metric").count()
      assert(metricRows > 0 && metricRows % 4 == 0)
      val mediaRows = serving.filter(col("sk").startsWith("METRIC#") &&
        col("record_type") === "media_profile").count()
      assert(mediaRows > 0 && mediaRows % 6 == 0)
      val ranks = serving
        .filter(col("sk").between("GENRE_RANK#1", "GENRE_RANK#3"))
        .select("sk").distinct().as[String].collect().toSet
      assert(ranks.subsetOf(Set("GENRE_RANK#1", "GENRE_RANK#2", "GENRE_RANK#3")))
    } finally serving.unpersist()
  }
}

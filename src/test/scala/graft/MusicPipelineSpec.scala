package graft

import org.apache.spark.sql.functions._

/** End-to-end reference-schema pipeline: the golden semantics a user of
  * the reference expects after switching engines.
  */
class MusicPipelineSpec extends SparkSuite {
  import spark.implicits._

  private def streams = Seq(
    ("u1", "t1", "2025-06-22 10:00:00"),
    ("u1", "t1", "2025-06-22 11:00:00"),
    ("u2", "t1", "2025-06-22 12:00:00"),
    ("u2", "t2", "2025-06-22 13:00:00"),
    ("u3", "t3", "2025-06-23 09:00:00"),   // second day
    ("u9", "t1", "2025-06-22 09:00:00"),   // unknown user → dropped by join
    ("u1", "bad", "not-a-time")            // malformed ts → dropped by validation
  ).toDF("user_id", "track_id", "listen_time")

  private def songs = Seq(
    ("t1", "Song1", "A", "80", "60000", " Rock"),
    ("t2", "Song2", "B", "70", "30000", "pop"),
    ("t3", "Song3", "C", "60", "90000", "rock")
  ).toDF("track_id", "track_name", "artists", "popularity", "duration_ms", "track_genre")

  private def users = Seq(
    ("u1", "Ann", "30", "US", "2024-01-01 00:00:00"),
    ("u2", "Bob", "40", "DE", "2024-01-01 00:00:00"),
    ("u3", "Cyd", "50", "FR", "2024-01-01 00:00:00")
  ).toDF("user_id", "user_name", "user_age", "user_country", "created_at")

  test("full run: KPIs, top-K, serving items match reference semantics") {
    val out = MusicPipeline.run(streams, songs, users)

    val kpis = out.genreKpis.orderBy("track_genre", "date").collect()
    // rock on 06-22: 3 plays (u1×2, u2×1), 2 listeners, 180000 ms total
    val rock22 = kpis.find(r => r.getString(0) == "rock"
      && r.getDate(1).toString == "2025-06-22").get
    assert(rock22.getLong(2) == 3 && rock22.getLong(3) == 2)
    assert(rock22.getLong(4) == 180000L)
    assert(rock22.getDouble(6) == 90000.0)  // per-user avg

    val topSongs = out.topSongs.filter(col("track_genre") === "rock"
      && col("date") === "2025-06-22").orderBy("rank").collect()
    assert(topSongs.length == 1 && topSongs(0).getString(2) == "t1")

    val topGenres = out.topGenres.filter(col("date") === "2025-06-22")
      .orderBy("rank").collect()
    assert(topGenres.map(_.getString(1)).toSeq == Seq("rock", "pop"))

    // serving: 4 metric items per kpi row + 1 per rank row
    val nKpi = out.genreKpis.count()
    val items = out.servingItems.cache()
    try {
      assert(items.filter(col("record_type") === "genre_metric").count() == nKpi * 4)
      assert(items.filter(!col("pk").rlike("^(GENRE#[a-z]+#DATE#|DATE#)\\d{4}.*")).isEmpty)
    } finally items.unpersist()
  }

  test("PROCESS_DATE scope: single-day run excludes other days") {
    val out = MusicPipeline.run(streams, songs, users, Some("2025-06-22"))
    assert(out.genreKpis.filter(col("date") =!= "2025-06-22").isEmpty)
    assert(out.genreKpis.count() == 2)
  }

  test("SQL registration: native functions usable from spark.sql") {
    graft.functions.native.registerAll(spark)
    val row = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
        |       simhash64(array(CAST(7 AS BIGINT))) AS s,
        |       jaccard_sim(array('a','b'), array('b','c')) AS j,
        |       minhash_sig(array('a','b'), 4) AS m,
        |       rolling_min_hash('abcdefghij', 8) AS r""".stripMargin).head()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(row.getLong(1) == 7L)
    assert(math.abs(row.getDouble(2) - 1.0 / 3) < 1e-12)
    assert(row.getSeq[Long](3).length == 4)
  }
}

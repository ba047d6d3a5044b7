package graft.ingest

import graft.SparkSuite
import org.apache.spark.sql.types._

/** Validation rules P4–P8 / F1–F8 against the reference's golden schemas
  * (FIXTURES.md §A).
  */
class ValidateSpec extends SparkSuite {
  import spark.implicits._

  test("P4: missing required column fails fast") {
    val df = Seq(("u1", "Ann")).toDF("user_id", "user_name")
    val e = intercept[IllegalArgumentException] {
      Validate.validateUsers(df)
    }
    assert(e.getMessage.contains("user_age"))
  }

  test("users: golden schema + age range + null drop (P5, P6)") {
    val raw = Seq(
      ("u1", "Ann", "30", "US", "2024-01-01 10:00:00"),
      ("u2", "Bob", "12", "US", "2024-01-01 10:00:00"),   // under 13 → dropped
      ("u3", "Cyd", "121", "US", "2024-01-01 10:00:00"),  // over 120 → dropped
      ("u4", null, "40", "US", "2024-01-01 10:00:00"),    // null name → dropped
      ("u5", "Eve", "abc", "US", "2024-01-01 10:00:00")   // unparseable age → dropped
    ).toDF("user_id", "user_name", "user_age", "user_country", "created_at")
    val out = Validate.validateUsers(raw)
    assert(out.schema("user_age").dataType == IntegerType)
    assert(out.schema("created_at").dataType == TimestampType)
    assert(out.select("user_id").as[String].collect().toSet == Set("u1"))
  }

  test("songs: cast-or-null popularity, zero-fill duration, lower+trim genre (P7, F7, F8)") {
    val raw = Seq(
      ("t1", "Song A", "X", "90", "1000", "  ROCK "),
      ("t2", "Song B", "Y", "bad", "1000", "pop"),  // unparseable popularity → dropped
      ("t3", "Song C", "Z", "50", null, "jazz")     // null duration → 0
    ).toDF("track_id", "track_name", "artists", "popularity", "duration_ms", "track_genre")
    val out = Validate.validateSongs(raw).orderBy("track_id")
    val rows = out.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("t1", "t3"))
    assert(rows(0).getString(5) == "rock")
    assert(rows(1).getInt(4) == 0)
  }

  test("streams: timestamp parse-or-drop, µs precision native (P8, F1, F2)") {
    val raw = Seq(
      ("u1", "t1", "2025-06-22 11:19:53.123456"),
      ("u2", "t2", "not-a-time"),
      ("u3", null, "2025-06-22 11:19:53")
    ).toDF("user_id", "track_id", "listen_time")
    val out = Validate.validateStreams(raw)
    assert(out.count() == 1)
    assert(out.schema.map(f => (f.name, f.dataType)) == Seq(
      ("user_id", StringType), ("track_id", StringType), ("listen_time", TimestampType)))
    // µs precision survives (the reference forces this by hand)
    val ts = out.select("listen_time").head().getTimestamp(0)
    assert(ts.getNanos == 123456000)
  }

  test("validation is idempotent: validate∘validate = validate") {
    val raw = Seq(
      ("u1", "Ann", "30", "US", "2024-01-01 10:00:00"),
      ("u2", "Bob", "12", "US", "2024-01-01 10:00:00")
    ).toDF("user_id", "user_name", "user_age", "user_country", "created_at")
    val once = Validate.validateUsers(raw)
    val twice = Validate.validateUsers(once)
    assert(once.collect().toSeq == twice.collect().toSeq)
  }
}

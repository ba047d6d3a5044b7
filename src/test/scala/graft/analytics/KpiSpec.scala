package graft.analytics

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class KpiSpec extends SparkSuite {
  import spark.implicits._

  private def tinyEnriched = Seq(
    // (event_type, date, user_id, value)
    ("click", "2024-01-01", 1L, 10.0),
    ("click", "2024-01-01", 1L, 20.0),
    ("click", "2024-01-01", 2L, 30.0),
    ("view", "2024-01-01", 3L, 5.0)
  ).toDF("event_type", "date", "user_id", "value")

  test("A1/A2: counts, distincts, exact sums, derived ratio") {
    val out = Kpis.genreKpis(tinyEnriched).orderBy("event_type").collect()
    val click = out(0)
    assert(click.getLong(2) == 3)              // listen_count
    assert(click.getLong(3) == 2)              // unique_listeners
    assert(click.getDouble(4) == 60.0)         // total_value
    assert(click.getDouble(5) == 20.0)         // avg_value
    assert(click.getDouble(6) == 30.0)         // avg_value_per_user
  }

  test("property: sum of per-group listen_count equals total events") {
    val enriched = Enrich.enriched(spark, sfDir)
    val total = enriched.count()
    val summed = Kpis.genreKpis(enriched)
      .agg(sum("listen_count")).head().getLong(0)
    assert(summed == total)
  }

  test("W1: ranks are 1..k, measures non-increasing, ties broken by key asc") {
    val df = Seq(
      ("A", "d1", 101L), ("A", "d1", 101L), ("A", "d1", 102L),
      ("A", "d1", 102L), ("A", "d1", 103L), ("A", "d1", 104L)
    ).toDF("g", "date", "key")
      .groupBy("g", "date", "key").agg(count(lit(1)).as("play_count"))
    val top = Kpis.topKPerGroup(df, Seq(col("g"), col("date")),
      col("play_count"), Seq(col("key")), 3)
      .orderBy("rank").collect()
    assert(top.map(_.getInt(4)).toSeq == Seq(1, 2, 3))
    // counts: 101→2, 102→2, 103→1, 104→1; tie at 2 broken by key asc
    assert(top.map(_.getLong(2)).toSeq == Seq(101L, 102L, 103L))
    val counts = top.map(_.getLong(3))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("W1 on fixtures: every (flag, day) group has ≤3 rows") {
    val over = Kpis.topPartsPerFlagDay(spark, sfDir)
      .groupBy("l_returnflag", "date").count().filter(col("count") > 3)
    assert(over.isEmpty)
  }

  test("HLL variant approximates exact distinct within 10%") {
    val enriched = Enrich.enriched(spark, sfDir)
    val exact = Kpis.genreKpis(enriched)
      .select(col("event_type"), col("date"), col("unique_listeners"))
    val approx = Kpis.genreKpisApprox(enriched)
      .select(col("event_type"), col("date"),
        col("unique_listeners").as("approx_listeners"))
    val joined = exact.join(approx, Seq("event_type", "date")).collect()
    joined.foreach { r =>
      val (e, a) = (r.getLong(2).toDouble, r.getLong(3).toDouble)
      assert(math.abs(e - a) / e <= 0.10, s"HLL off by >10%: exact=$e approx=$a")
    }
  }

  test("broadcast join: enrichment plan contains BroadcastHashJoin") {
    val plan = Enrich.enriched(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("KMV distinct: exact below k, estimator within 4·rse above k") {
    val enriched = Enrich.enriched(spark, sfDir)
    // k above every group's distinct count → pure exact branch
    val allExact = Kpis.genreKpisKmv(enriched, k = 100000).collect()
    allExact.foreach { r =>
      assert(r.getLong(3) == r.getLong(2),
        s"below-k group must report exact: $r")
    }
    // estimator branch on a synthetic 20k-distinct group at the
    // production k=256: KMV rse = 1/sqrt(k-2) ≈ 6.3%, allow 4 sigma
    val k = 256
    val n = 20000
    val big = spark.range(n.toLong)
      .select(lit("g").as("event_type"), lit("2024-01-01").as("date"),
        col("id").as("user_id"))
    val est = Kpis.genreKpisKmv(big, k = k).collect()
    assert(est.length == 1 && est.head.getLong(2) == n.toLong)
    val bound = 4.0 / math.sqrt(k - 2.0)
    val a = est.head.getLong(3).toDouble
    assert(math.abs(n - a) / n <= bound, s"KMV off by >$bound: exact=$n est=$a")
  }

  test("retention cohorts: offset-0 is the full cohort, counts never exceed it") {
    val out = Kpis.retentionCohorts(Tables.events(spark, sfDir)).collect()
    assert(out.nonEmpty)
    val byCohort = out.groupBy(_.getDate(0))
    byCohort.foreach { case (_, rows) =>
      val r0 = rows.find(_.getInt(1) == 0).get
      assert(r0.getDouble(4) == 1.0, "day-0 retention must be 1")
      rows.foreach { r =>
        assert(r.getLong(2) <= r0.getLong(2), "active count cannot exceed cohort size")
        assert(r.getDouble(4) <= 1.0 && r.getDouble(4) > 0.0)
        assert(r.getLong(3) == math.round(r.getDouble(4) * 1e6),
          "ppm and double shares must agree")
      }
    }
    // cohort sizes partition the user base exactly
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    val sized = byCohort.values.map(_.find(_.getInt(1) == 0).get.getLong(2)).sum
    assert(sized == users, s"cohorts must partition users: $sized != $users")
  }

  test("event funnel: monotone non-increasing, step-1 conversion is 1") {
    val out = Kpis.eventFunnel(Tables.events(spark, sfDir))
      .orderBy(col("step")).collect()
    assert(out.map(_.getString(1)).toSeq == Seq("view", "click", "purchase"))
    val counts = out.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"funnel must be monotone: ${counts.toSeq}")
    assert(out.head.getDouble(3) == 1.0)
    // hand-checkable micro-fixture: strict ordering semantics
    val tiny = Seq(
      // u1 converts fully; u2 views only; u3 clicks before viewing (no
      // click credit); u4 view→click but purchase precedes click
      (1L, "view", "2024-01-01 00:00:00"), (1L, "click", "2024-01-01 01:00:00"),
      (1L, "purchase", "2024-01-01 02:00:00"),
      (2L, "view", "2024-01-01 00:00:00"),
      (3L, "click", "2024-01-01 00:00:00"), (3L, "view", "2024-01-01 01:00:00"),
      (4L, "view", "2024-01-01 00:00:00"), (4L, "purchase", "2024-01-01 00:30:00"),
      (4L, "click", "2024-01-01 01:00:00")
    ).toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val t = Kpis.eventFunnel(tiny).orderBy(col("step")).collect()
    assert(t.map(_.getLong(2)).toSeq == Seq(4L, 2L, 1L),
      s"strict-order semantics: ${t.toSeq}")
  }

  test("userSessions: planted gaps split sessions, durations exact in micros") {
    val tiny = Seq(
      (1L, 10L, "2024-01-01 00:00:00"), (1L, 11L, "2024-01-01 00:10:00"),
      (1L, 12L, "2024-01-01 00:40:00"),             // 30:00 gap — SAME session (not >30m)
      (1L, 13L, "2024-01-01 01:10:00.000001"),      // 30:00.000001 — new session
      (2L, 20L, "2024-01-01 12:00:00")
    ).toDF("user_id", "event_id", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = Kpis.userSessions(tiny, gapMinutes = 30)
      .orderBy(col("user_id"), col("session_seq")).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 1L, 3L), (1L, 2L, 1L), (2L, 1L, 1L)))
    val s1 = out.head
    assert(s1.getAs[Long]("duration_us") == 40L * 60 * 1000000)
    // sessions partition the events exactly
    assert(out.map(_.getLong(2)).sum == tiny.count())
  }

  test("funnelWindowed: gap window enforced, in-window anchor chosen, ppm exact") {
    val tiny = Seq(
      // u1: full conversion inside the 7-day windows
      (1L, "view", "2024-01-01 00:00:00"), (1L, "click", "2024-01-03 00:00:00"),
      (1L, "purchase", "2024-01-08 00:00:00"),
      // u2: click 10 days after view — outside the window, no credit
      (2L, "view", "2024-01-01 00:00:00"), (2L, "click", "2024-01-11 00:00:00"),
      // u3: two clicks; the OUT-of-window one is ignored, the in-window
      // one anchors, and the purchase within 7 days of IT converts
      (3L, "view", "2024-01-01 00:00:00"), (3L, "click", "2024-01-20 00:00:00"),
      (3L, "click", "2024-01-05 00:00:00"), (3L, "purchase", "2024-01-10 00:00:00"),
      // u4: click at the exact same instant as view — strictly-after
      // required, no credit
      (4L, "view", "2024-01-01 00:00:00"), (4L, "click", "2024-01-01 00:00:00")
    ).toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val t = Kpis.funnelWindowed(tiny, Seq("view", "click", "purchase"), 7)
      .orderBy(col("step")).collect()
    assert(t.map(_.getLong(2)).toSeq == Seq(4L, 2L, 2L),
      s"windowed semantics: ${t.toSeq}")
    // ppm is the half-up integer of n/step1; double exactly ppm/1e6
    t.foreach { r =>
      val ppm = (2 * r.getLong(2) * 1000000L + 4L) / 8L
      assert(r.getLong(4) == ppm && r.getDouble(3) == ppm.toDouble / 1e6)
    }
  }

  test("funnelWindowed skew guard: a million-event bot completes, cap semantics hold") {
    import org.apache.spark.sql.functions._
    // bot user 1: 10^6 view events in one hour — without the pre-agg
    // rank cap this is a single million-element collect_list buffer
    val bot = spark.range(1000000L)
      .select(lit(1L).as("user_id"), lit("view").as("event_type"),
        (lit(1704067200L) + col("id")).cast("timestamp").as("ts"))
    // user 2 converts normally
    val human = Seq(
      (2L, "view", "2024-01-01 00:00:00"), (2L, "click", "2024-01-02 00:00:00"))
      .toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val df = Kpis.funnelWindowed(bot.unionByName(human),
      Seq("view", "click"), 7)
    val out = df.orderBy(col("step")).collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 1L),
      s"bot counts as a viewer, only the human converts: ${out.toSeq}")
    // no-silent-caps: the bot's truncated view list is visible in-data
    assert(out.map(_.getAs[Long]("n_capped_users")).toSeq == Seq(1L, 0L),
      s"the capped bot must be counted per step: ${out.toSeq}")
    // the rank filter must ride WindowGroupLimit so map tasks truncate
    // their own (user, step) runs before anything shuffles
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit pushdown:\n$plan")
    // documented cap semantics: candidates are the EARLIEST N events
    // per step — a qualifying event beyond that prefix is a non-reach
    val tricky = Seq(
      (1L, "view", "2024-01-05 00:00:00"),
      (1L, "click", "2024-01-01 00:00:00"), // before anchor (and in cap)
      (1L, "click", "2024-01-02 00:00:00"), // before anchor (and in cap)
      (1L, "click", "2024-01-06 00:00:00")  // qualifies, but beyond cap=2
    ).toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val capped = Kpis.funnelWindowed(tricky, Seq("view", "click"), 7,
      maxEventsPerStep = 2).orderBy(col("step")).collect()
    assert(capped.map(_.getLong(2)).toSeq == Seq(1L, 0L),
      s"in-window click hidden past the cap must not count: ${capped.toSeq}")
    assert(capped.map(_.getAs[Long]("n_capped_users")).toSeq == Seq(0L, 1L),
      s"the 3-click user must be reported capped at the click step: ${capped.toSeq}")
  }
}

package graft.analytics

import graft.{SparkSuite, Tables}
import graft.sources.Layout
import java.nio.file.Files
import org.apache.spark.sql.functions._

class SkewLayoutSpec extends SparkSuite {
  import spark.implicits._

  test("salted count-distinct equals plain countDistinct") {
    val ev = Tables.events(spark, sfDir)
    val plain = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_distinct"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCountDistinct(ev, Seq("event_type"), $"user_id")
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("salted counts equal plain aggregation") {
    val ev = Tables.events(spark, sfDir).withColumn("v", col("value"))
    val plain = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("v").as("total"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Skew.saltedCounts(ev, Seq("event_type"), "v", spreadCol = "event_id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (n, t)) =>
      assert(n == plain(k)._1)
      assert(math.abs(t - plain(k)._2) < 1e-6)
    }
  }

  test("date-partitioned layout prunes partitions for day queries") {
    val dir = Files.createTempDirectory("graft-layout").toString + "/events"
    Layout.writeDatePartitioned(Tables.events(spark, sfDir), "ts", dir)
    val day = spark.read.parquet(dir).select(min($"date").cast("string")).head().getString(0)
    val q = Layout.readDay(spark, dir, day)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("date"),
      s"expected partition pruning in plan:\n$scan")
    // pruned read returns exactly the day's rows
    val expected = Tables.events(spark, sfDir)
      .filter(to_date($"ts") === lit(day)).count()
    assert(q.count() == expected && expected > 0)
  }

  test("incremental KPI merge: only affected partitions rewritten, equals full recompute") {
    val root = Files.createTempDirectory("graft-merge").toString
    val factDir = s"$root/events"; val outDir = s"$root/kpis"
    val events = Tables.events(spark, sfDir)
    Layout.writeDatePartitioned(events, "ts", factDir)
    def aggregate(facts: org.apache.spark.sql.DataFrame) =
      facts.groupBy($"event_type", $"date")
        .agg(count(lit(1)).as("n"), countDistinct($"user_id").as("uniq"))
        .select($"event_type", $"n", $"uniq", $"date".cast("string").as("date"))

    val days = events.select(to_date($"ts").cast("string")).distinct()
      .as[String].collect().sorted
    assert(days.length >= 2, "fixture needs ≥2 days")
    val (d1, d2) = (days.head, days(1))

    // initial load: day-1 only
    val b1 = events.filter(to_date($"ts") === lit(d1))
    assert(Layout.mergeDaily(spark, factDir, outDir, b1, aggregate) == Seq(d1))

    // incremental batch: day-2 events plus a late day-1 event → both
    // dates recomputed from the (pruned) fact table, nothing else
    val b2 = events.filter(to_date($"ts") === lit(d2))
      .union(events.filter(to_date($"ts") === lit(d1)).limit(1))
    assert(Layout.mergeDaily(spark, factDir, outDir, b2, aggregate).toSet == Set(d1, d2))

    // table state for loaded days equals a from-scratch recompute
    val loaded = spark.read.parquet(outDir)
      .select($"event_type", $"n", $"uniq", $"date".cast("string").as("date"))
    val full = aggregate(events.withColumn("date", to_date($"ts")))
      .filter($"date".isin(d1, d2))
    assert(loaded.exceptAll(full).isEmpty && full.exceptAll(loaded).isEmpty,
      "incremental merge must equal full recompute for the loaded days")

    // empty batch → no-op
    assert(Layout.mergeDaily(spark, factDir, outDir,
      events.filter(lit(false)), aggregate).isEmpty)
  }
}

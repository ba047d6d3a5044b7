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
}

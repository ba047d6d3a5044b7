package graft.plans

import graft.SparkSuite
import graft.analytics.AsOf
import java.sql.Timestamp
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

class AsOfNativeSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 11:00:00"), 110.0),
    (2L, ts("2024-01-01 09:00:00"), 200.0)
  ).toDF("q_key", "q_ts", "price")

  private def trades = Seq(
    (101L, 1L, ts("2024-01-01 10:30:00")), // after 10:00 quote → 100.0
    (102L, 1L, ts("2024-01-01 11:00:00")), // AT 11:00 quote → inclusive → 110.0
    (103L, 1L, ts("2024-01-01 09:59:59")), // before any quote → null
    (104L, 2L, ts("2024-01-02 00:00:00")), // stale quote still carried → 200.0
    (105L, 3L, ts("2024-01-01 12:00:00"))  // unknown key → null
  ).toDF("trade_id", "t_key", "t_ts")

  test("native as-of: latest prior wins, inclusive boundary, null-pad on no match") {
    val out = NativeAsOf.join(trades, quotes, "t_key", "q_key", "t_ts", "q_ts", Seq("price"))
      .orderBy("trade_id").collect()
    assert(out(0).getDouble(3) == 100.0)
    assert(out(1).getDouble(3) == 110.0)
    assert(out(2).isNullAt(3))
    assert(out(3).getDouble(3) == 200.0)
    assert(out(4).isNullAt(3))
  }

  test("native as-of: NULL keys and times never match (SQL equality semantics)") {
    val q = Seq((Some(1L), Some(ts("2024-01-01 10:00:00")), 1.0))
      .toDF("q_key", "q_ts", "price")
    val t = Seq(
      (201L, None, Some(ts("2024-01-01 11:00:00"))),      // null key
      (202L, Some(1L), None),                             // null time
      (203L, Some(1L), Some(ts("2024-01-01 11:00:00")))   // matches
    ).toDF("trade_id", "t_key", "t_ts")
    val out = NativeAsOf.join(t, q, "t_key", "q_key", "t_ts", "q_ts", Seq("price"))
      .orderBy("trade_id").collect()
    assert(out(0).isNullAt(3) && out(1).isNullAt(3))
    assert(out(2).getDouble(3) == 1.0)
  }

  test("native as-of matches the composed union+window formulation on real tables") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        date_trunc("second", col("ts")).as("ts"))
    val ord = graft.Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"), col("o_orderdate").as("ot"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val native = NativeAsOf.join(ev, ord, "user_id", "o_custkey", "ts", "ot",
        Seq("o_orderkey"), hint = "merge")
      .select("event_id", "o_orderkey").collect().map(_.toString).sorted
    val composed = AsOf.join(ev, ord, "user_id", "o_custkey", "ts", "ot", Seq("o_orderkey"))
      .select("event_id", "o_orderkey").collect().map(_.toString).sorted
    assert(native.length > 0 && native.sameElements(composed))
  }

  test("AsOfJoinPruning: unused child columns pruned under the join, result unchanged") {
    import org.apache.spark.sql.functions.lit
    val q = quotes.withColumn("junk_q", lit("x"))
    val t = trades.withColumn("junk_t", lit("y"))
    val df = NativeAsOf.join(t, q, "t_key", "q_key", "t_ts", "q_ts", Seq("price"))
      .select("trade_id", "price")
    val j = df.queryExecution.optimizedPlan
      .collect { case a: AsOfJoinPlan => a }.head
    assert(j.left.output.map(_.name).toSet == Set("trade_id", "t_key", "t_ts"),
      s"junk_t must be pruned: ${j.left.output}")
    assert(j.right.output.map(_.name).toSet == Set("q_key", "q_ts", "price"),
      s"junk_q must be pruned: ${j.right.output}")
    val out = df.orderBy("trade_id").collect()
    assert(out.length == 5 && out(0).getDouble(1) == 100.0 && out(2).isNullAt(1))
  }

  test("as-of stats: output sized from the left side, not a child product") {
    val df = NativeAsOf.join(trades, quotes, "t_key", "q_key", "t_ts", "q_ts",
      Seq("price"), hint = "merge")
    val j = df.queryExecution.optimizedPlan
      .collect { case a: AsOfJoinPlan => a }.head
    assert(j.stats.sizeInBytes == j.left.stats.sizeInBytes * 2,
      s"expected 2x left, got ${j.stats.sizeInBytes}")
    assert(j.stats.sizeInBytes < j.left.stats.sizeInBytes * j.right.stats.sizeInBytes)
  }

  test("broadcast as-of: same semantics as merge, zero shuffles, left side untouched") {
    val df = NativeAsOf.join(trades, quotes, "t_key", "q_key", "t_ts", "q_ts",
      Seq("price"), hint = "broadcast")
    val out = df.orderBy("trade_id").collect()
    assert(out(0).getDouble(3) == 100.0)
    assert(out(1).getDouble(3) == 110.0) // inclusive boundary
    assert(out(2).isNullAt(3))           // before any quote
    assert(out(3).getDouble(3) == 200.0) // stale carry
    assert(out(4).isNullAt(3))           // unknown key
    df.count()
    val plan = df.queryExecution.executedPlan
    assert(plan.toString.contains("BroadcastAsOfJoin"))
    val shuffles = plan.collectWithSubqueries { case e: ShuffleExchangeLike => e }
    assert(shuffles.isEmpty, s"broadcast as-of must not shuffle either side:\n$plan")
  }

  test("broadcast as-of matches merge as-of on real tables") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        date_trunc("second", col("ts")).as("ts"))
    val ord = graft.Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"), col("o_orderdate").as("ot"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    def run(hint: String) =
      NativeAsOf.join(ev, ord, "user_id", "o_custkey", "ts", "ot",
        Seq("o_orderkey"), hint)
        .select("event_id", "o_orderkey").collect().map(_.toString).sorted
    assert(run("broadcast").sameElements(run("merge")))
  }

  test("native as-of plan: AsOfJoinExec node, one exchange per side, no product join") {
    val df = NativeAsOf.join(trades, quotes, "t_key", "q_key", "t_ts", "q_ts",
      Seq("price"), hint = "merge")
    df.count() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("AsOfJoin"), s"expected AsOfJoinExec in:\n$s")
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"))
    val exchanges = plan.collectWithSubqueries { case e: ShuffleExchangeLike => e }
    assert(exchanges.size <= 2, s"expected ≤2 exchanges (one per side), got:\n$s")
  }
}

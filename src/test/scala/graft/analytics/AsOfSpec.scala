package graft.analytics

import graft.SparkSuite
import java.sql.Timestamp

class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of: latest prior right row wins; inclusive boundary; left rows without match get null") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-01 09:00:00"), 200.0)
    ).toDF("q_key", "q_ts", "price")
    val trades = Seq(
      (101L, 1L, ts("2024-01-01 10:30:00")),  // after 10:00 quote → 100.0
      (102L, 1L, ts("2024-01-01 11:00:00")),  // AT 11:00 quote → inclusive → 110.0
      (103L, 1L, ts("2024-01-01 09:59:59")),  // before any quote → null
      (104L, 2L, ts("2024-01-02 00:00:00")),  // stale quote still carried → 200.0
      (105L, 3L, ts("2024-01-01 12:00:00"))   // unknown key → null
    ).toDF("trade_id", "t_key", "t_ts")

    val out = AsOf.join(trades, quotes, "t_key", "q_key", "t_ts", "q_ts", Seq("price"))
      .orderBy("trade_id").collect()
    assert(out(0).getDouble(3) == 100.0)
    assert(out(1).getDouble(3) == 110.0)
    assert(out(2).isNullAt(3))
    assert(out(3).getDouble(3) == 200.0)
    assert(out(4).isNullAt(3))
  }

  test("as-of plan: single hash exchange per side key, no cartesian/range join") {
    val quotes = Seq((1L, ts("2024-01-01 10:00:00"), 1.0)).toDF("q_key", "q_ts", "price")
    val trades = Seq((1L, 1L, ts("2024-01-01 10:30:00"))).toDF("trade_id", "t_key", "t_ts")
    val plan = AsOf.join(trades, quotes, "t_key", "q_key", "t_ts", "q_ts", Seq("price"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must not degrade to a product join:\n$plan")
  }
}

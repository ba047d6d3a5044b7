package graft.analytics

import graft.SparkSuite

class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  private val orders = Seq(
    (1L, 10L, 1000L),
    (2L, 10L, 5000L),
    (3L, 20L, 1000L)
  ).toDF("order_id", "cust", "t0")
  // window = 100s; events placed to probe both boundaries and a
  // bucket-crossing interval (t0=5000 spans buckets 50 and 51)
  private val events = Seq(
    (10L, 1000L),   // == t0 → inclusive
    (10L, 1099L),   // t0+99 → in
    (10L, 1100L),   // t0+100 → exclusive, out
    (10L, 5099L),   // in for order 2 (crosses bucket boundary)
    (20L, 1050L),   // other key, order 3
    (99L, 1000L)    // unknown key
  ).toDF("cust", "et")

  test("keyed range join: inclusive start, exclusive end, key-scoped") {
    val out = RangeJoin.joinKeyed(orders, events, "cust", "cust", "t0", "et", 100L)
      .groupBy("order_id").count()
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 2)  // 1000, 1099
    assert(out(2L) == 1)  // 5099
    assert(out(3L) == 1)  // 1050
  }

  test("keyed range join plan: equi-join on the key, no explode, no nested loop") {
    val plan = RangeJoin.joinKeyed(orders, events, "cust", "cust", "t0", "et", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"keyed range join must stay an equi-join on the key:\n$plan")
    assert(!plan.toLowerCase.contains("generate"),
      s"keyed range join must not pay the bucket explode:\n$plan")
  }

  test("keyless range join: same matches without any key, bucket-boundary safe") {
    // drop the key: every order interval sees every event time
    val out = RangeJoin.joinKeyless(orders, events, "t0", "et", 100L)
      .groupBy("order_id").count()
      .as[(Long, Long)].collect().toMap
    // t0=1000 intervals match events at 1000, 1099, 1050, 1000 = 4 each
    assert(out(1L) == 4 && out(3L) == 4)
    assert(out(2L) == 1)  // only 5099 (bucket-crossing)
  }

  test("keyless range join plan: hash/sort-merge on bucket, no nested loop") {
    val plan = RangeJoin.joinKeyless(orders, events, "t0", "et", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"keyless range join must become an equi-join on the bucket:\n$plan")
  }
}

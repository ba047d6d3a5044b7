package graft.analytics

import graft.SparkSuite

class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  test("range join: inclusive start, exclusive end, key-scoped, bucket-boundary safe") {
    val orders = Seq(
      (1L, 10L, 1000L),
      (2L, 10L, 5000L),
      (3L, 20L, 1000L)
    ).toDF("order_id", "cust", "t0")
    // window = 100s; events placed to probe both boundaries and a
    // bucket-crossing interval (t0=5000 spans buckets 50 and 51)
    val events = Seq(
      (10L, 1000L),   // == t0 → inclusive
      (10L, 1099L),   // t0+99 → in
      (10L, 1100L),   // t0+100 → exclusive, out
      (10L, 5099L),   // in for order 2 (crosses bucket boundary)
      (20L, 1050L),   // other key, order 3
      (99L, 1000L)    // unknown key
    ).toDF("cust", "et")
    val out = RangeJoin.join(orders, events, "cust", "cust", "t0", "et", 100L)
      .groupBy("order_id").count()
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 2)  // 1000, 1099
    assert(out(2L) == 1)  // 5099
    assert(out(3L) == 1)  // 1050
  }

  test("range join plan: hash/sort-merge on (bucket,key), no nested loop") {
    val orders = Seq((1L, 10L, 1000L)).toDF("order_id", "cust", "t0")
    val events = Seq((10L, 1000L)).toDF("cust", "et")
    val plan = RangeJoin.join(orders, events, "cust", "cust", "t0", "et", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must stay an equi-join on (bucket,key):\n$plan")
  }
}

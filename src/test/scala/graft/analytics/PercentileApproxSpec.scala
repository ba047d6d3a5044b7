package graft.analytics

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Bounds the approx_percentile sketch (the 100 TB scale path for
  * `a7_percentiles`) against the exact per-group percentiles on the
  * fixtures: with accuracy 10000 the rank error is ≤ 1/10000, so on
  * fixture-sized groups the estimate must land within a tight value
  * neighborhood of the exact answer.
  */
class PercentileApproxSpec extends SparkSuite {

  test("approx percentiles stay within 1% of exact on every group") {
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("m"),
        expr("percentile(l_extendedprice, 0.5)").as("p"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_quantity, 0.5, 10000)").as("m"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p"))
      .collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val (em, ep) = exact(r.getString(0))
      assert(math.abs(r.getDouble(1) - em) <= math.max(0.01 * em, 1e-9),
        s"qty median off: exact=$em approx=${r.getDouble(1)}")
      assert(math.abs(r.getDouble(2) - ep) <= math.max(0.01 * ep, 1e-9),
        s"price median off: exact=$ep approx=${r.getDouble(2)}")
    }
  }
}

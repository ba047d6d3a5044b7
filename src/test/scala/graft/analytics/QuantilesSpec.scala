package graft.analytics

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Histogram-quantile sketch invariants beyond the oracle replay:
  * partitioning invariance (the mergeability claim), the in-data error
  * bound, and exactness on a degenerate single-value group.
  */
class QuantilesSpec extends SparkSuite {
  import spark.implicits._

  private def li = graft.Tables.lineitem(spark, sfDir)

  test("estimates carry their own error bound and clear it") {
    val rows = Quantiles.histogramQuantiles(li).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("pass"), s"bound trip: $r")
      assert(math.abs(r.getAs[Double]("est_price") - r.getAs[Double]("exact_price"))
        <= 2 * r.getAs[Double]("bin_width"))
    }
  }

  test("bit-identical under repartitioning (bins merge by addition)") {
    val a = Quantiles.histogramQuantiles(li.repartition(1))
      .orderBy(col("l_returnflag"), col("p")).collect().toSeq
    val b = Quantiles.histogramQuantiles(li.repartition(13))
      .orderBy(col("l_returnflag"), col("p")).collect().toSeq
    assert(a == b)
  }

  test("single-value group estimates exactly") {
    val one = Seq(("X", 42.00), ("X", 42.00), ("X", 42.00))
      .toDF("l_returnflag", "l_extendedprice")
    val rows = Quantiles.histogramQuantiles(one).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("est_price") == 42.00, s"degenerate group: $r")
    }
  }
}

package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic mergeable quantile sketch — the hash-green twin of
  * `a11_percentiles_approx` (whose t-digest-style internals are
  * engine-private, so it can only gate rows-only): a fixed-width
  * HISTOGRAM on an integer grid. Bin counts are exact longs that merge
  * by addition at ANY parallelism — the sketch property that matters
  * at 100 TB (approx_percentile's bounded buffer, without the
  * engine-specific merge order) — and every derived number below is
  * integral arithmetic, so DuckDB replays the estimate to the bit.
  *
  * Estimator: values land on the cent grid (the fixture's prices are
  * 2-dp decimals; `cast(x*100 + 0.5 as long)` is exact for them), one
  * pass takes per-group (min, max, n), one partial-aggregated pass
  * fills B equi-width integer bins, and the p-quantile is a half-step
  * linear interpolation INSIDE the located bin:
  *   r      = ceil(p·n)                  (integer: (n·pn + pd − 1) div pd)
  *   bin    = first with cum ≥ r
  *   est_u  = lo_u + ((hi_u − lo_u) · (2(r − cum_before) − 1)) div (2·cnt)
  * The rank-r element lies in the chosen bin, so |est − element_r| <
  * one bin width; vs the CONTINUOUS exact percentile (which may
  * interpolate across the edge) the bound is two widths. The report
  * carries the exact percentile and a pass column against that bound —
  * the recall-report discipline, so the accuracy claim sits in the
  * gate's snapshot. At 100 TB the exact column is the part you drop;
  * the sketch passes are the serving path.
  */
object Quantiles {

  /** (numerator, denominator) quantile fractions — integers so the
    * target rank is computed without a double anywhere.
    */
  val defaultPs: Seq[(Int, Int)] = Seq((1, 2), (95, 100))

  def histogramQuantiles(lineitem: DataFrame, bins: Int = 256,
                         ps: Seq[(Int, Int)] = defaultPs): DataFrame = {
    require(bins > 0, s"bin count must be positive: $bins")
    // explicit floor on both sides: DuckDB's double→BIGINT cast ROUNDS
    // while Spark's truncates — floor(x·100 + 0.5) is the one form the
    // engines agree on (and is exact for the fixture's 2-dp prices)
    val cents = lineitem.select(col("l_returnflag"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("c"))
    val ranges = cents.groupBy(col("l_returnflag"))
      .agg(min(col("c")).as("mn"), max(col("c")).as("mx"),
        count(lit(1)).as("n"))
    val binned = cents
      .join(broadcast(ranges), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"),
        expr(s"((c - mn) * $bins) div (mx - mn + 1)").as("bin"))
      .agg(count(lit(1)).as("cnt"))
    val cum = binned.withColumn("cum",
      sum(col("cnt")).over(Window.partitionBy(col("l_returnflag"))
        .orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // exact percentiles ride along for the in-data error bound (the
    // part a 100 TB serving path drops)
    val exactCols = ps.map { case (pn, pd) =>
      round(expr(s"percentile(l_extendedprice, ${pn.toDouble / pd})"), 6)
        .as(s"ex_${pn}_$pd")
    }
    val exact = lineitem.groupBy(col("l_returnflag"))
      .agg(exactCols.head, exactCols.tail: _*)
    val perP = ps.map { case (pn, pd) =>
      val r = expr(s"(n * $pn + ${pd - 1}) div $pd") // ceil(p·n)
      cum.join(broadcast(ranges.select(col("l_returnflag"), col("mn"),
          col("mx"), col("n"))), Seq("l_returnflag"))
        .withColumn("r", r)
        .filter(col("cum") >= col("r"))
        // first qualifying bin = the one holding rank r
        .groupBy(col("l_returnflag"))
        .agg(min(struct(col("bin"), col("cnt"), col("cum"), col("mn"),
          col("mx"), col("n"), col("r"))).as("s"))
        .select(col("l_returnflag"), col("s.*"))
        .withColumn("lo_u", expr(s"mn + (bin * (mx - mn + 1)) div $bins"))
        .withColumn("hi_u", expr(s"mn + ((bin + 1) * (mx - mn + 1)) div $bins"))
        .withColumn("est_u", expr(
          "lo_u + ((hi_u - lo_u) * (2 * (r - (cum - cnt)) - 1)) div (2 * cnt)"))
        .select(col("l_returnflag"),
          lit(s"$pn/$pd").as("p"),
          col("n"), col("est_u"),
          (col("est_u").cast("double") / lit(100.0)).as("est_price"),
          ((col("hi_u") - col("lo_u")).cast("double") / lit(100.0))
            .as("bin_width"))
    }.reduce(_ unionByName _)
    perP.join(broadcast(exact), Seq("l_returnflag"))
      .withColumn("exact_price", ps.map { case (pn, pd) =>
        when(col("p") === s"$pn/$pd", col(s"ex_${pn}_$pd"))
      }.reduce(_.otherwise(_)))
      .select(col("l_returnflag"), col("p"), col("n"), col("est_u"),
        col("est_price"), col("exact_price"), col("bin_width"),
        (abs(col("est_price") - col("exact_price")) <= col("bin_width") * 2)
          .as("pass"))
  }
}

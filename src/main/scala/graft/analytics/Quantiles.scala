package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
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
  * 2-dp decimals; `floor(x*100 + 0.5)` is exact for them), one
  * pass takes per-group (min, max, n), one partial-aggregated pass
  * fills B equi-width integer bins, and the p-quantile is a half-step
  * linear interpolation INSIDE the located bin:
  *   r      = ceil(p·n)                  (integer: (n·pn + pd − 1) div pd)
  *   bin    = first with cum ≥ r
  *   est_u  = lo_u + ((hi_u − lo_u) · (2(r − cum_before) − 1)) div (2·cnt)
  * The rank-r element lies in the chosen bin, so |est − element_r| <
  * one bin width; vs the CONTINUOUS exact percentile (which may
  * interpolate across the edge) the bound is two widths.
  *
  * The full report ([[histogramQuantiles]]) carries the exact
  * percentile and a pass column against that bound — the recall-report
  * discipline, so the accuracy claim sits in the gate's snapshot. The
  * exact rider is ALSO integral end to end: the rank-⌊h⌋ / rank-⌈h⌉
  * order statistics are taken on the cent grid (one per-group sort —
  * the cost an exact percentile always pays) and interpolated with a
  * half-up integral division into micro-price units
  *   h       = 1 + p·(n−1);  i = (pn·(n−1)) div pd;  rem = (…) mod pd
  *   exact_u = hu((x_{i+1}·pd + rem·(x_{i+2} − x_{i+1})) · 10⁴, pd)
  * so no `round(double, …)` appears anywhere in the lineage; the two
  * price doubles are each ONE terminal division off their integer
  * column, and the pass comparison itself is integer-vs-integer.
  *
  * At 100 TB the exact column is the part you drop — the sketch-only
  * serving shape is [[histogramQuantileServe]] (no per-group sort, two
  * partial-agg passes + a broadcast, near-flat in n).
  */
object Quantiles {

  /** (numerator, denominator) quantile fractions — integers so the
    * target rank is computed without a double anywhere.
    */
  val defaultPs: Seq[(Int, Int)] = Seq((1, 2), (95, 100))

  /** Sketch-only estimate: per (group, p) the histogram estimate in
    * cents (`est_u`), its price double (one terminal division) and the
    * bin width the error is bounded by. `width_u` (cents) rides along
    * for the full report's integral pass check.
    */
  def histogramQuantileServe(lineitem: DataFrame, bins: Int = 256,
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
    ps.map { case (pn, pd) =>
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
          (col("hi_u") - col("lo_u")).as("width_u"),
          ((col("hi_u") - col("lo_u")).cast("double") / lit(100.0))
            .as("bin_width"))
    }.reduce(_ unionByName _)
  }

  /** Full gate report: sketch estimate + the exact continuous
    * percentile (cent-grid order statistics, half-up integral
    * interpolation into micro-price `exact_u`) + an integer-vs-integer
    * pass column against the two-bin-width bound.
    */
  def histogramQuantiles(lineitem: DataFrame, bins: Int = 256,
                         ps: Seq[(Int, Int)] = defaultPs): DataFrame = {
    val sketch = histogramQuantileServe(lineitem, bins, ps)
    val cents = lineitem.select(col("l_returnflag"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("c"))
    val ranges = cents.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
    // one per-group sort, then ONE conditional-agg pass picks the two
    // order statistics for every p at once (no per-p re-scan)
    val ranked = cents
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("l_returnflag")).orderBy(col("c"))))
      .join(broadcast(ranges), Seq("l_returnflag"))
    def idx(pn: Int, pd: Int): Column = expr(s"($pn * (n - 1)) div $pd")
    val hit = ps.map { case (pn, pd) =>
      col("rk") >= idx(pn, pd) + 1 && col("rk") <= idx(pn, pd) + 2
    }.reduce(_ || _)
    val aggs = ps.flatMap { case (pn, pd) =>
      val in = col("rk") >= idx(pn, pd) + 1 && col("rk") <= idx(pn, pd) + 2
      Seq(min(when(in, col("c"))).as(s"lo_${pn}_$pd"),
          max(when(in, col("c"))).as(s"hi_${pn}_$pd"))
    } :+ first(col("n")).as("n")
    val picked = ranked.filter(hit)
      .groupBy(col("l_returnflag")).agg(aggs.head, aggs.tail: _*)
    // exact_u = hu((lo·pd + rem·(hi − lo)) · 10⁴, pd), micro-price
    val exact = picked.select(Seq(col("l_returnflag")) ++
      ps.map { case (pn, pd) =>
        expr(s"""(2 * (lo_${pn}_$pd * $pd +
                 (($pn * (n - 1)) % $pd) * (hi_${pn}_$pd - lo_${pn}_$pd))
                 * 10000 + $pd) div (2 * $pd)""".stripMargin)
          .as(s"exu_${pn}_$pd")
      }: _*)
    sketch.join(broadcast(exact), Seq("l_returnflag"))
      .withColumn("exact_u", ps.map { case (pn, pd) =>
        when(col("p") === s"$pn/$pd", col(s"exu_${pn}_$pd"))
      }.reduce(_.otherwise(_)))
      .select(col("l_returnflag"), col("p"), col("n"), col("est_u"),
        col("est_price"), col("exact_u"),
        (col("exact_u").cast("double") / lit(1000000.0)).as("exact_price"),
        col("bin_width"),
        // integer-vs-integer: est in micro-price vs exact in micro-price,
        // bound = two bin widths in micro-price
        (abs(col("est_u") * 10000 - col("exact_u")) <= col("width_u") * 20000)
          .as("pass"))
  }
}

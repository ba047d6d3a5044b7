package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — match left rows to right rows whose timestamp
  * falls in [t0, t0 + window). Two shapes with very different optimal
  * plans:
  *
  *  - '''Keyed''' ([[joinKeyed]]): the join already has an equi-key
  *    (e.g. `l_orderkey = o_orderkey`). The right plan is the plain hash
  *    join on the key with the range condition as a residual predicate —
  *    the key alone bounds the candidate set, so any extra bucketing
  *    only doubles the probe rows and widens the shuffle for zero
  *    selectivity gain.
  *  - '''Keyless''' ([[joinKeyless]]): no equi-key — Spark would plan a
  *    nested-loop product (fatal at scale). The standard time-bucket
  *    trick manufactures an equi-key: both sides get a bucket of width
  *    `window`, the left interval is exploded to the (at most 2) buckets
  *    it can touch, and the exact range predicate filters the bucket-pair
  *    candidates. The join becomes a hash join on the bucket — shuffle
  *    proportional to data, candidates proportional to true matches.
  */
object RangeJoin {

  /** Keyed interval join: hash join on the key, range as residual.
    *
    * @param leftStart epoch-seconds interval start on the left
    * @param rightTime epoch-seconds instant on the right; matches when
    *                  leftStart <= rightTime < leftStart + windowSec
    */
  def joinKeyed(left: DataFrame, right: DataFrame,
                leftKey: String, rightKey: String,
                leftStart: String, rightTime: String,
                windowSec: Long): DataFrame =
    left.join(right,
      left(leftKey) === right(rightKey) &&
        right(rightTime) >= left(leftStart) &&
        right(rightTime) < left(leftStart) + windowSec)

  /** Keyless interval join via time-bucketing: equi-join on the
    * manufactured bucket column, exact range predicate on candidates.
    * Left interval [t0, t0+w) can only intersect buckets floor(t0/w)
    * and floor(t0/w)+1.
    */
  def joinKeyless(left: DataFrame, right: DataFrame,
                  leftStart: String, rightTime: String,
                  windowSec: Long): DataFrame = {
    val b = lit(windowSec)
    val l = left
      .withColumn("_lb", explode(array(floor(col(leftStart) / b),
        floor(col(leftStart) / b) + 1)))
    val r = right
      .withColumn("_rb", floor(col(rightTime) / b))
    l.join(r,
        l("_lb") === r("_rb") &&
          r(rightTime) >= l(leftStart) &&
          r(rightTime) < l(leftStart) + windowSec)
      .drop("_lb", "_rb")
  }
}

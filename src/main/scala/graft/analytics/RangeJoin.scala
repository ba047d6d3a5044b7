package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — match left rows to right rows with the same
  * key whose timestamp falls in [t0, t0 + window). Spark plans a naive
  * `l.key = r.key AND r.t BETWEEN l.t0 AND l.t0+w` as a sort-merge join
  * on the key alone (fine) or, keyless, a nested-loop product (fatal at
  * scale). This composition adds the standard time-bucket trick: both
  * sides get an equi-join bucket of width `window`, the left side is
  * exploded to the (at most 2) buckets its interval can touch, and the
  * exact range predicate filters the bucket-pair candidates. The join is
  * then a plain hash join on (key, bucket) — shuffle proportional to
  * data, candidate set proportional to true matches.
  */
object RangeJoin {

  /** @param left   frame with `leftKey` and epoch-seconds `leftStart`
    * @param right  frame with `rightKey` and epoch-seconds `rightTime`
    * @param windowSec interval length in seconds; right matches when
    *                  leftStart <= rightTime < leftStart + windowSec
    */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftStart: String, rightTime: String,
           windowSec: Long): DataFrame = {
    val b = lit(windowSec)
    // left interval [t0, t0+w) can only intersect buckets floor(t0/w)
    // and floor(t0/w)+1
    val l = left
      .withColumn("_lb", explode(array(floor(col(leftStart) / b),
        floor(col(leftStart) / b) + 1)))
    val r = right
      .withColumn("_rb", floor(col(rightTime) / b))
    l.join(r,
        l("_lb") === r("_rb") &&
          l(leftKey) === r(rightKey) &&
          r(rightTime) >= l(leftStart) &&
          r(rightTime) < l(leftStart) + windowSec)
      .drop("_lb", "_rb")
  }
}

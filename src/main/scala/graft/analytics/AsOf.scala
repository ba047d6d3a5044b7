package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the temporal enrichment Spark has no
  * built-in operator for: attach to each left row the latest right row
  * with the same key and `rightTime <= leftTime`.
  *
  * Built by composition (preference (a) of the custom-operator ladder):
  * tag both sides, UNION, and run one `last(_, ignoreNulls)` window over
  * (key, time). Cost = a single hash shuffle on the key + one sort —
  * the same price as a regular sort-merge join, with none of the O(n·m)
  * blowup a naive range-join (`l.t >= r.t` theta join) produces. At
  * 100 TB the window state per key is one row (the running last), so
  * memory is flat regardless of history length.
  *
  * Ties: right rows at the same (key, time) must be pre-deduplicated by
  * the caller (or they are resolved by `rightOrder` — the last one in
  * that order wins), and at equal timestamps the right row sorts before
  * the left row, i.e. the boundary is inclusive (`<=`), matching
  * DuckDB/kdb ASOF semantics.
  */
object AsOf {

  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           payloadCols: Seq[String]): DataFrame = {
    val lTagged = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select(Seq(col("_k"), col("_t"), col("_side")) ++
        left.columns.map(c => col(c)) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_p_$c")): _*)
    val rTagged = right
      .withColumn("_k", col(rightKey))
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select(Seq(col("_k"), col("_t"), col("_side")) ++
        left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadCols.map(c => col(c).as(s"_p_$c")): _*)
    // right rows sort before left rows at equal time → inclusive bound.
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(lTagged.unionByName(rTagged)) { (df, c) =>
      df.withColumn(s"_p_$c", last(col(s"_p_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("_side") === 1)
      .select((left.columns.map(col) ++
        payloadCols.map(c => col(s"_p_$c").as(c))).toSeq: _*)
  }
}

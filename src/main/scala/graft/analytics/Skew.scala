package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for low-cardinality hot keys (SURVEY.md §7.4: "salting
  * guidance for skewed genres").
  *
  * Spark's partial aggregation already absorbs most groupBy skew (each
  * mapper pre-combines its rows before the shuffle), and AQE splits
  * skewed *join* partitions at runtime. Salting is the remaining tool
  * for the case both miss: an aggregation whose per-key state is too
  * heavy to pre-combine (exact distincts, large collect-style buffers)
  * where one key dominates. The two-phase shape below spreads phase 1
  * of a hot key over `salts` reducers, then merges the partials.
  */
object Skew {

  /** Deterministic salt derived from a spreading column (no rand() —
    * results must be reproducible for the oracle gate and for replays).
    */
  def salt(spread: Column, salts: Int): Column = pmod(xxhash64(spread), lit(salts))

  /** Two-phase salted count-distinct: phase 1 dedupes (key, salt-bucketed
    * values) across `salts` reducers, phase 2 sums the per-bucket
    * distinct counts. Exact, because the value itself picks the bucket —
    * a value never lands in two buckets.
    */
  def saltedCountDistinct(df: DataFrame, keys: Seq[String], value: Column,
                          salts: Int = 16): DataFrame = {
    val bucketed = df.groupBy(keys.map(col) :+ salt(value, salts).as("_salt"): _*)
      .agg(countDistinct(value).as("_partial"))
    bucketed.groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as("n_distinct"))
  }

  /** Two-phase salted sum/count for arbitrarily heavy keys. The salt
    * must come from a row-spreading column (`spreadCol` — a row id or
    * other high-cardinality field), NOT the measure: a hot key whose
    * rows share one measure value would otherwise still land in a
    * single bucket. (saltedCountDistinct is the exception — there the
    * salt must be value-derived for exactness.)
    */
  def saltedCounts(df: DataFrame, keys: Seq[String], measure: String,
                   spreadCol: String, salts: Int = 16): DataFrame = {
    val phase1 = df
      .withColumn("_salt", salt(col(spreadCol), salts))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(count(lit(1)).as("_n"), sum(col(measure)).as("_s"))
    phase1.groupBy(keys.map(col): _*)
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("total"))
  }
}

package graft.analytics

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-enrichment joins — the J1/J2 core of the reference's analytics
  * job (`glue_jobs/music-streaming-transform.py:65-76`): the fact stream
  * inner-joined with two small dimensions, then a `to_date` derivation
  * (F3, `music-streaming-transform.py:79`) and an optional single-day
  * filter (P9, `:82-85`).
  *
  * Fixture mapping (FIXTURES.md §B): `events` plays the streams fact,
  * `customer` the users dimension, `part`/`orders` give a second
  * fact→dim chain for coverage.
  *
  * Scale notes (100 TB): both dimensions are broadcast — the fact side
  * is never shuffled for enrichment, so the join cost is a single
  * map-side stage regardless of fact size. Dimensions are projected to
  * the needed columns *before* the broadcast (P1/P2,
  * `music-streaming-transform.py:66,73`) so the broadcast payload stays
  * minimal. If a dimension outgrew broadcast size the fallback is a
  * shuffled hash join on the key both tables are bucketed by.
  */
object Enrich {

  /** J1: events ⋈ customer(user_id = c_custkey), broadcast dim. */
  def eventsWithUsers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    // P2-style projection before the broadcast join.
    val users = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_mktsegment"))
    ev.join(broadcast(users), ev("user_id") === users("c_custkey"), "inner")
  }

  /** J1 + F3: enriched events with the derived daily-window column
    * (`date = to_date(ts)` — tumbling 1-day window, reference
    * `music-streaming-transform.py:79`).
    */
  def enriched(spark: SparkSession, dir: String): DataFrame =
    eventsWithUsers(spark, dir).withColumn("date", to_date(col("ts")))

  /** P9: optional equality filter on the derived date — scopes a run to
    * one processing day (`music-streaming-transform.py:82-85`). With a
    * date-partitioned fact table this prunes partitions at the source.
    */
  def forDay(df: DataFrame, processDate: Option[String]): DataFrame =
    processDate.fold(df)(d => df.filter(col("date") === to_date(lit(d), "yyyy-MM-dd")))

  /** P9 with the process date computed *in-plan*: `processDay` is a
    * 1-row/1-column (`_process_date`, date) aggregate that is broadcast
    * inner-joined onto the fact — the scalar never touches the driver,
    * so the query stays one job (vs. a `.head()` fetch = job per run).
    */
  def forDayOf(df: DataFrame, processDay: DataFrame): DataFrame =
    df.join(broadcast(processDay), col("date") === col("_process_date"))
      .drop("_process_date")

  /** J2 chain on the second fact path: lineitem ⋈ orders ⋈ customer.
    * orders→customer is dim-sized (broadcast); lineitem→orders is the
    * only shuffle-bearing join and both sides shuffle on o_orderkey —
    * at scale these two tables would be co-bucketed on the order key to
    * eliminate it.
    */
  def salesEnriched(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"), col("l_quantity"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"), "inner")
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"), "inner")
  }
}

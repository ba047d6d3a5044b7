package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The streaming KMV buffer's invariants, plus equality against the
  * rank-window batch formulation it replaces in streams.
  */
class KmvAggregatorSpec extends SparkSuite {
  import spark.implicits._

  private val agg = KmvAggregator(4)

  test("buffer stays sorted, distinct and capped through reduce") {
    val buf = Seq(9L, 7L, 9L, 3L, 7L, 11L, 5L, 1L)
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf == Seq(1L, 3L, 5L, 7L), "k smallest distinct, ascending")
    // an incoming value above the full buffer's max is a no-op
    assert(agg.reduce(buf, 100L) eq buf)
    // a duplicate of a held value is a no-op
    assert(agg.reduce(buf, 5L) == buf)
  }

  test("merge is a linear dedup-merge, order-insensitive") {
    val a = Seq(1L, 5L, 9L, 13L)
    val b = Seq(1L, 3L, 9L, 21L)
    assert(agg.merge(a, b) == Seq(1L, 3L, 5L, 9L))
    assert(agg.merge(b, a) == agg.merge(a, b))
    assert(agg.merge(agg.zero, a) == a)
  }

  test("finish: exact branch below k, k-th statistic at k") {
    assert(agg.finish(Seq(4L, 8L)) == ((2L, -1L)))
    assert(agg.finish(Seq(2L, 4L, 6L, 8L)) == ((4L, 8L)))
  }

  test("streaming query equals the batch dedup+rank formulation, invariant under partitioning") {
    val q = graft.stream.StreamQueries.queries("stream_kmv_daily")
    val streamed = q(spark, sfDir).collect().toSeq
    // batch twin: distinct hashes, rank window, same integral estimate
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val dh = graft.Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("date"), h.as("h")).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("date")).orderBy(col("h"))
    val num2 = (BigInt(31) * BigInt(2).pow(61)).toString
    val batch = dh.withColumn("rn", row_number().over(w))
      .groupBy(col("date"))
      .agg(count(lit(1)).as("uniq"), max(when(col("rn") === 32, col("h"))).as("hk"))
      .join(graft.Tables.events(spark, sfDir)
        .groupBy(to_date(col("ts")).as("date"))
        .agg(count(lit(1)).as("n_events")), Seq("date"))
      .select(col("date").cast("string").as("date"), col("n_events"),
        least(col("uniq"), lit(32L)).as("uniq_seen"),
        when(col("uniq") < 32, col("uniq")).otherwise(expr(
          s"CAST((CAST('$num2' AS DECIMAL(38,0)) + hk) DIV (2 * hk) AS BIGINT)"))
          .as("uniq_kmv"))
      .orderBy(col("date")).collect().toSeq
    assert(streamed == batch)
    // determinism at any parallelism: the aggregator over a repartition
    val kmv = udaf(KmvAggregator(32), org.apache.spark.sql.Encoders.scalaLong)
    def viaParts(n: Int) = graft.Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("date"), h.as("h"))
      .repartition(n)
      .groupBy(col("date")).agg(kmv(col("h")).as("s"))
      .orderBy(col("date")).collect().toSeq
    assert(viaParts(1) == viaParts(13))
  }
}

package graft.analytics

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** The co-location story SCALING.md promises for the one shuffle-bearing
  * join (lineitem ⋈ orders): bucket both tables on the order key and the
  * sort-merge join runs with ZERO Exchange operators — at 100 TB this
  * removes the dominant shuffle of the enrichment chain.
  */
class BucketedJoinSpec extends SparkSuite {

  test("co-bucketed tables join without a shuffle") {
    // warehouse.dir is a static conf — tables land in the session's
    // default spark-warehouse; dropped (managed → files deleted) below.
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_b")

    // Force SMJ so the bucketed layout (not a broadcast) carries the join.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sfDir).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}

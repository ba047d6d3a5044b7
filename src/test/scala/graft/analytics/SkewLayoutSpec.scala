package graft.analytics

import graft.{SparkSuite, Tables}
import graft.sources.Layout
import java.nio.file.Files
import org.apache.spark.sql.functions._

class SkewLayoutSpec extends SparkSuite {
  import spark.implicits._

  test("salted count-distinct equals plain countDistinct") {
    val ev = Tables.events(spark, sfDir)
    val plain = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_distinct"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCountDistinct(ev, Seq("event_type"), $"user_id")
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("salted counts equal plain aggregation") {
    val ev = Tables.events(spark, sfDir).withColumn("v", col("value"))
    val plain = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("v").as("total"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Skew.saltedCounts(ev, Seq("event_type"), "v", spreadCol = "event_id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (n, t)) =>
      assert(n == plain(k)._1)
      assert(math.abs(t - plain(k)._2) < 1e-6)
    }
  }

  test("date-partitioned layout prunes partitions for day queries") {
    val dir = Files.createTempDirectory("graft-layout").toString + "/events"
    Layout.writeDatePartitioned(Tables.events(spark, sfDir), "ts", dir)
    val day = spark.read.parquet(dir).select(min($"date").cast("string")).head().getString(0)
    val q = Layout.readDay(spark, dir, day)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("date"),
      s"expected partition pruning in plan:\n$scan")
    // pruned read returns exactly the day's rows
    val expected = Tables.events(spark, sfDir)
      .filter(to_date($"ts") === lit(day)).count()
    assert(q.count() == expected && expected > 0)
  }
}

package graft.analytics

import graft.SparkSuite

class BucketedSpec extends SparkSuite {
  import spark.implicits._

  private def joinExchanges(df: org.apache.spark.sql.DataFrame): Int = {
    // exchanges BELOW the aggregate: subtract the agg's own shuffle
    // (grouping key ≠ bucket key, so it legitimately remains)
    val plan = df.queryExecution.executedPlan.toString
    "Exchange hashpartitioning".r.findAllIn(plan).size
  }

  test("bucketed fact⋈fact join plans zero join exchanges; unbucketed pays two") {
    val bucketed = Bucketed.salesByPriority(spark, sfDir)
    val raw = Bucketed.salesByPriorityUnbucketed(spark, sfDir)
    val nBucketed = joinExchanges(bucketed)
    val nRaw = joinExchanges(raw)
    // both plans shuffle once for the groupBy; only the raw one also
    // shuffles both join inputs
    assert(nRaw == nBucketed + 2,
      s"bucketing must remove both join exchanges: bucketed=$nBucketed raw=$nRaw\n" +
        bucketed.queryExecution.executedPlan)
    // and the results are identical
    assert(bucketed.as[(String, Long, Double)].collect().toSeq ==
      raw.as[(String, Long, Double)].collect().toSeq)
  }

  test("bucketed tables rebuild on fixture change, not on re-ensure") {
    val root = s"${graft.ext.Artifact.root(sfDir)}/bucketed"
    Bucketed.ensureTables(spark, sfDir)
    val meta = graft.ext.Artifact.readMeta(spark, root)
    assert(meta.exists(_.startsWith("bucketed v1 ")))
    Bucketed.ensureTables(spark, sfDir)
    assert(graft.ext.Artifact.readMeta(spark, root) == meta, "re-ensure must not rebuild")
  }
}

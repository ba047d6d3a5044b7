package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** RRF fusion properties independent of the oracle: rank arithmetic,
  * full-outer semantics for one-list-only documents, the pinned
  * tie-break, and the k boundary.
  */
class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  private def sparseList(ids: Seq[Long]): org.apache.spark.sql.DataFrame =
    ids.zipWithIndex.map { case (id, i) =>
      (id, 1L, 100.0 - i) // descending scores => rank order = input order
    }.toDF("doc_id", "n_terms", "score")

  private def denseList(ids: Seq[Long]): org.apache.spark.sql.DataFrame =
    ids.zipWithIndex.map { case (id, i) =>
      (0L, (i + 1).toLong, id, "x", 1.0 - i * 0.01)
    }.toDF("q_id", "rank", "n_id", "n_label", "cos")

  test("doc in both lists outscores docs in one list at equal ranks") {
    val fused = Retrieval.rrfFuse(
      sparseList(Seq(10L, 11L, 12L)), denseList(Seq(10L, 13L, 14L)), k = 10)
      .collect()
    assert(fused.head.getAs[Long]("doc_id") == 10L)
    val both = fused.head.getAs[Double]("rrf_score")
    assert(math.abs(both - math.rint(2.0 / 61.0 * 1e6) / 1e6) < 1e-9)
    // one-list docs carry a null rank for the missing list
    val only11 = fused.find(_.getAs[Long]("doc_id") == 11L).get
    assert(only11.isNullAt(only11.fieldIndex("r_dense")))
    assert(only11.getAs[Long]("r_sparse") == 2L)
  }

  test("equal-score ties break by doc_id ascending and k truncates") {
    // two docs each appear only in one list at the same rank => same score
    val fused = Retrieval.rrfFuse(
      sparseList(Seq(20L)), denseList(Seq(5L)), k = 1).collect()
    assert(fused.length == 1)
    assert(fused.head.getAs[Long]("doc_id") == 5L)
  }

  test("bounded-input contract enforced: oversized sparse list fails loudly") {
    val big = spark.range(50L)
      .select(col("id").as("doc_id"), lit(1L).as("n_terms"),
        (lit(100.0) - col("id")).as("score"))
    val e = intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(big, denseList(Seq(1L)), k = 5, maxList = 10).collect()
    }
    assert(e.getMessage.contains("bound"), e.getMessage)
    // at the bound itself it still computes
    assert(Retrieval.rrfFuse(big, denseList(Seq(1L)), k = 5, maxList = 50)
      .count() == 5L)
  }

  test("bounded rank path runs no unpartitioned window operator") {
    val fused = Retrieval.rrfFuse(sparseList(Seq(1L, 2L)), denseList(Seq(2L)), k = 5)
    // optimizedPlan, not executedPlan: AQE wraps the physical tree in
    // AdaptiveSparkPlanExec and collect() cannot see inside it pre-run
    val wins = fused.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "an unpartitioned window here would spam 'No Partition Defined' " +
        "warnings into the bench tail and mask real ones")
    // and the sort+offset rank agrees with the windowed formulation
    val rows = fused.orderBy(col("doc_id")).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    assert(rows.map(_.getAs[Long]("r_sparse")).toSeq == Seq(1L, 2L))
  }

  test("rrf_score is monotone non-increasing in output order") {
    val fused = Retrieval.rrfFuse(
      sparseList(Seq(1L, 2L, 3L, 4L)), denseList(Seq(3L, 4L, 5L, 6L)), k = 8)
      .collect()
    val scores = fused.map(_.getAs[Double]("rrf_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(fused.length == 6)
  }
}

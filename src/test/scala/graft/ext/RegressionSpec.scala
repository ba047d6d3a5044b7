package graft.ext

import graft.SparkSuite

/** Closed-form OLS properties the oracle can't isolate: exact
  * coefficient recovery on a noiseless design, r2 bounds, and the
  * residual-ranking contract.
  */
class RegressionSpec extends SparkSuite {
  import spark.implicits._

  // y = 7 + 2*x1 + 3*x2 exactly, on a non-collinear integer design
  private def noiseless = Seq(
    (0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 2L), (3L, 5L, 2L),
    (4L, 8L, 3L), (5L, 13L, 5L), (6L, 21L, 8L), (7L, 34L, 13L))
    .map { case (id, x1, x2) => (id, x1, x2, 7L + 2 * x1 + 3 * x2) }
    .toDF("doc_id", "x1", "x2", "y")

  test("noiseless design recovers exact round-6 coefficients and r2=1") {
    val row = Regression.fit(noiseless).collect().head
    assert(row.getAs[Long]("n") == 8L)
    assert(row.getAs[Double]("beta0") == 7.0)
    assert(row.getAs[Double]("beta1") == 2.0)
    assert(row.getAs[Double]("beta2") == 3.0)
    assert(row.getAs[Double]("r2") == 1.0)
  }

  test("noiseless residuals are all zero and k-bounded") {
    val res = Regression.topResiduals(noiseless, k = 5).collect()
    assert(res.length == 5)
    assert(res.forall(_.getAs[Double]("resid") == 0.0))
    // zero ties break by doc_id ascending
    assert(res.map(_.getAs[Long]("doc_id")).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("fixture fit is well-conditioned and explains most length variance") {
    val row = Regression.fit(
      Regression.features(graft.Tables.documents(spark, sfDir)))
      .collect().head
    assert(row.getAs[Double]("r2") > 0.9 && row.getAs[Double]("r2") <= 1.0)
    assert(row.getAs[Double]("beta1") > 0.0) // more tokens => more chars
  }
}

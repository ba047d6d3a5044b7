package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The invariants that stand in for the SQL-irreducible eigensolve:
  * spectrum identities against the (oracle-verified) covariance, basis
  * orthonormality, and the projection-variance contract.
  */
class PcaSpec extends SparkSuite {

  private lazy val emb = graft.Tables.embeddings(spark, sfDir)
  private lazy val cov = Pca.covMatrix(Pca.covariance(emb))
  private lazy val eigen = Pca.jacobiEigen(cov)

  test("eigenvalues sum to the covariance trace, sorted desc, psd") {
    val (vals, _) = eigen
    val trace = cov.indices.map(i => cov(i)(i)).sum
    assert(math.abs(vals.sum - trace) < 1e-6 * math.max(1.0, math.abs(trace)))
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
    assert(vals.head > 0.0)
    assert(vals.last > -1e-6) // psd up to round-6 noise in the input cells
  }

  test("eigenvector basis is orthonormal and satisfies A v = lambda v") {
    val (vals, vecs) = eigen
    for (a <- 0 until 4; b <- 0 until 4) {
      val dot = (0 until Pca.Dims).map(i => vecs(a)(i) * vecs(b)(i)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-8,
        s"basis not orthonormal at ($a,$b): $dot")
    }
    val k = 0 // strongest axis: residual ||A v - lambda v|| ~ 0
    val av = (0 until Pca.Dims).map(r =>
      (0 until Pca.Dims).map(c => cov(r)(c) * vecs(k)(c)).sum)
    val resid = math.sqrt((0 until Pca.Dims)
      .map(r => math.pow(av(r) - vals(k) * vecs(k)(r), 2)).sum)
    assert(resid < 1e-6, s"eigen residual $resid")
  }

  test("projection variance equals the leading eigenvalues") {
    val (vals, _) = eigen
    val proj = Pca.projectTop2(spark, emb)
      .agg(avg(col("pc1") * col("pc1")).as("v1"), avg(col("pc1")).as("m1"),
        avg(col("pc2") * col("pc2")).as("v2"), avg(col("pc2")).as("m2"))
      .collect().head
    val var1 = proj.getDouble(0) - proj.getDouble(1) * proj.getDouble(1)
    val var2 = proj.getDouble(2) - proj.getDouble(3) * proj.getDouble(3)
    assert(math.abs(var1 - vals(0)) < 1e-3 * math.max(1.0, vals(0)))
    assert(math.abs(var2 - vals(1)) < 1e-3 * math.max(1.0, vals(1)))
    assert(var1 >= var2) // pc1 carries at least pc2's variance
  }

  test("memo-served covariance cells equal the distributed pass") {
    val direct = Pca.covariance(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    val served = Pca.covarianceCells(spark, emb, key = sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    assert(direct.toSeq == served.toSeq)
  }

  test("treeAggregate fast path agrees with the exact-decimal pass") {
    val fast = Pca.covarianceFastMatrix(emb)
    val maxDiff = (for (i <- 0 until Pca.Dims; j <- 0 until Pca.Dims)
      yield math.abs(fast(i)(j) - cov(i)(j))).max
    // exact cells are round-6; the fast path is unrounded double
    assert(maxDiff < 1e-5, s"fast/exact covariance diverge: $maxDiff")
  }

  test("explained ratios are a valid decreasing sub-distribution") {
    val rows = Pca.topEigvals(spark, emb, k = 8).collect()
    assert(rows.length == 8)
    val explained = rows.map(_.getAs[Double]("explained"))
    assert(explained.forall(e => e >= 0.0 && e <= 1.0))
    assert(explained.sum <= 1.0 + 1e-6)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 8))
  }
}

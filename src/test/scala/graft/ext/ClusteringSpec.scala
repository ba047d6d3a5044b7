package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSuite {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float], Int)*) =
    rows.toDF("vec_id", "embedding", "label")

  // two tight 2-D groups; seeds = v0, v1 (smallest ids, one per group)
  private def twoGroups = emb(
    (0L, Seq(0f, 0f), 1), (1L, Seq(10f, 10f), 2),
    (2L, Seq(1f, 0f), 1), (3L, Seq(9f, 10f), 2))

  test("hand-computed two-iteration run: assignment, centroids, inertia") {
    val out = Clustering.kmeans(twoGroups, k = 2, iters = 2)
      .select(col("vec_id"), col("cluster"), col("d2"))
      .as[(Long, Int, Double)].collect().sortBy(_._1)
    assert(out.map(t => t._1 -> t._2).toSeq ==
      Seq(0L -> 0, 1L -> 1, 2L -> 0, 3L -> 1))
    // iter-1 centroids: c0 = (0.5, 0), c1 = (9.5, 10) → every d2 = 0.25
    assert(out.forall(t => math.abs(t._3 - 0.25) < 1e-12))
    val stats = Clustering.clusterStats(
        Clustering.kmeans(twoGroups, k = 2, iters = 2))
      .as[(Int, Long, Double)].collect().toSeq
    assert(stats == Seq((0, 2L, 0.5), (1, 2L, 0.5)))
  }

  test("argmin ties go to the lower centroid id") {
    // v2 sits exactly between the two seeds
    val d = emb((0L, Seq(0f, 0f), 0), (1L, Seq(2f, 0f), 0),
      (2L, Seq(1f, 0f), 0))
    val a = Clustering.kmeans(d, k = 2, iters = 1)
      .select(col("vec_id"), col("cluster")).as[(Long, Int)]
      .collect().toMap
    assert(a(2L) == 0)
  }

  test("an empty cluster keeps its previous centroid") {
    // duplicate seed: every vector ties to c0, c1 never wins a member
    val d = emb((0L, Seq(0f, 0f), 0), (1L, Seq(0f, 0f), 0),
      (2L, Seq(0.5f, 0f), 0))
    val assigned = Clustering.assign(d, Clustering.seeds(d, 2))
    assert(assigned.filter(col("cluster") === 1).count() == 0)
    val next = Clustering.update(assigned, Clustering.seeds(d, 2))
    assert(next(1).toSeq == Seq(0.0, 0.0), "unwon centroid retained")
    // and the full loop still runs to a stable, total assignment
    assert(Clustering.kmeans(d, k = 2, iters = 3).count() == 3)
  }

  test("assignment is invariant under partitioning") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 100L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 4 - 2), rnd.nextInt(3)))
    val one = Clustering.kmeans(emb(rows: _*).repartition(1), k = 4, iters = 2)
      .select(col("vec_id"), col("cluster")).as[(Long, Int)].collect().sortBy(_._1).toSeq
    val many = Clustering.kmeans(emb(rows: _*).repartition(7), k = 4, iters = 2)
      .select(col("vec_id"), col("cluster")).as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(one == many)
  }

  test("assignment never shuffles the corpus") {
    val rnd = new scala.util.Random(3)
    val rows = (0L until 64L).map(i =>
      (i, Seq.fill(4)(rnd.nextFloat()), 0))
    val plan = Clustering.kmeans(emb(rows: _*), k = 4, iters = 2)
      .select(col("vec_id"), col("cluster"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"assignment must be scan+project only, got:\n$plan")
  }

  test("purity: plurality label per cluster, ties to the lower label") {
    // cluster 0 gets labels 5,5,3,3 → tie → top_label 3
    val d = emb((0L, Seq(0f), 5), (1L, Seq(100f), 9),
      (2L, Seq(0.1f), 5), (3L, Seq(0.2f), 3), (4L, Seq(0.3f), 3))
    val p = Clustering.clusterPurity(Clustering.kmeans(d, k = 2, iters = 2))
      .as[(Int, Long, Int, Long)].collect().toSeq
    assert(p == Seq((0, 4L, 3, 2L), (1, 1L, 9, 1L)))
  }
}

package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class GraphRankSpec extends SparkSuite {
  import spark.implicits._

  private def pairsDF(rows: (Long, Long)*) =
    rows.map { case (a, b) => (a, b, 1.0) }.toDF("a_id", "b_id", "jaccard")

  test("path graph: hub outranks leaves, symmetric leaves tie, mass ≈ 1") {
    val p = GraphRank.pagerank(pairsDF((1L, 2L), (2L, 3L)))
      .as[(Long, Double)].collect().toMap
    assert(p(1L) == p(3L), "symmetric positions must get identical rank")
    assert(p(2L) > p(1L), "the hub must outrank the leaves")
    assert(math.abs(p.values.sum - 1.0) < 1e-9)
  }

  test("hand-computed single iteration on the path graph") {
    val p = GraphRank.pagerank(pairsDF((1L, 2L), (2L, 3L)), iters = 1)
      .as[(Long, Double)].collect().toMap
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val third = 1.0 / 3
    val tele = 0.15 * third
    // node 2 receives both leaves' full mass; leaves get half the hub's
    assert(p(2L) == r9(tele + 0.85 * (r9(third) + r9(third))))
    assert(p(1L) == r9(tele + 0.85 * r9(third / 2)))
  }

  test("rank is invariant under input partitioning") {
    val g = pairsDF((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
      (10L, 11L))
    val a = GraphRank.pagerank(g.repartition(1)).as[(Long, Double)]
      .collect().sortBy(_._1).toSeq
    val b = GraphRank.pagerank(g.repartition(7)).as[(Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("canonical selection from the persisted artifacts picks the hub") {
    // star: doc 3 is the template every variant derives from; 1,2,4 are
    // leaf variants similar only to 3 — min-id would keep 1, the
    // centrality keeper must keep 3. Disjoint pair (10,11) ties on
    // symmetric rank → lower id 10.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base + " one"), (2L, base + " two"), (3L, base),
      (4L, base + " four"),
      (10L, "wholly different text cluster pair variant words shared tail one"),
      (11L, "wholly different text cluster pair variant words shared tail two"))
      .toDF("doc_id", "text")
    val work = "target/test_artifacts/graphrank"
    deleteRecursively(work)
    val pairDir = Dedup.ensurePairs(spark, docs, s"$work/neardup")
    val groupsDir = Dedup.ensureGroups(spark, pairDir, s"$work/dupgroups")
    val out = GraphRank.canonicalByRank(spark, pairDir, groupsDir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3)) ==
      Seq((1L, 3L, 4L), (10L, 10L, 2L)))

    // the rewrite keeps exactly the hubs: min-id keeper would keep 1
    val survivors = GraphRank.applyCanonical(spark, docs, pairDir, groupsDir)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(survivors == Set(3L, 10L))
  }
}

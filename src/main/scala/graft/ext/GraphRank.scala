package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity-weighted PageRank over the near-duplicate graph, and the
  * decision it exists for: CANONICAL SELECTION. `dedup_apply` keeps the
  * min-id member of each duplicate group — an arbitrary-but-
  * deterministic choice. The centrality keeper is the principled one:
  * the member the rest of the group is most similar to (the template
  * every variant derives from) survives; mirror/derivative copies drop.
  *
  * The rank MUST be similarity-weighted: at any workable Jaccard
  * threshold two docs that are both near a hub are usually near each
  * other too, so dup groups are clique-shaped and an unweighted walk
  * ties every member (measured on the fixture corpus: all 23 groups
  * degenerate to min-id). Edge weights — the pair table's exact
  * Jaccards — break the symmetry: the hub's edges carry more mass than
  * leaf-to-leaf edges, so it concentrates rank even inside a clique.
  *
  * Determinism contract (the oracle replays every iteration in SQL):
  *  - node set = every doc in a ≥-threshold pair; undirected edges both
  *    directions with w = round(jaccard, 9) (the stored Jaccard is the
  *    same integer-ratio division the oracle recomputes — bit-equal);
  *  - wdeg(u) = Σ w over u's edges, summed EXACTLY as DECIMAL(32,12);
  *  - p₀ = 1/N (one IEEE division, identical everywhere);
  *  - p_{t+1}(v) = round(0.15·(1/N) + 0.85·Σ_{u→v} term, 9) with
  *    term = round(p_t(u) · (w/wdeg(u)), 9), again summed exactly as
  *    DECIMAL(32,12) — order-independent, so the result is identical
  *    under any partitioning and aggregation order. 0.15 and 0.85 are
  *    independent literals on both sides (never computed as 1−d:
  *    `1 − 0.85` and the literal `0.15` are DIFFERENT doubles).
  *
  * Scale shape: everything is proportional to the DUP GRAPH (pairs ≪
  * corpus — the pair table is the already-persisted artifact), never
  * the corpus. Each iteration is one edges⋈rank join + one
  * partial-aggregated sum per destination; the edge table is
  * checkpointed once and reused; iterations are bounded (3). The
  * star-contraction CC sibling handles group LABELS; this adds the
  * WITHIN-group ordering CC cannot express.
  */
object GraphRank {

  private val Fixed = DecimalType(32, 12)

  /** Iterated similarity-weighted PageRank over an undirected pair
    * graph `(a_id, b_id, jaccard)`: returns `(id, p)`.
    */
  def pagerank(pairs: DataFrame, iters: Int = 3): DataFrame = {
    // lazy checkpoints (r19): the iteration count is FIXED (no
    // convergence action per round), so no superstep needs its own
    // eager materialization job — the single deg.count() below pins
    // edges+deg, and the query's final action materializes the whole
    // rank cascade (each round cached at its checkpoint barrier, plan
    // depth still truncated per round). Same arithmetic, ~5 fewer
    // sequential driver job rounds per serve.
    val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"),
        round(col("jaccard"), 9).as("w"))
      .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst"),
        round(col("jaccard"), 9).as("w")))
      .localCheckpoint(false)
    val deg = edges.groupBy(col("src"))
      .agg(sum(col("w").cast(Fixed)).cast("double").as("wdeg"))
      .localCheckpoint(false)
    val n = deg.count()
    val tele = 0.15 * (1.0 / n)
    var rank = deg.select(col("src").as("id"), lit(1.0 / n).as("p"))
    for (_ <- 1 to iters) {
      val pd = rank.join(deg, rank("id") === deg("src"))
        .select(col("id"), col("p"), col("wdeg"))
      rank = edges.join(pd, edges("src") === pd("id"))
        .select(col("dst"),
          round(col("p") * (col("w") / col("wdeg")), 9).cast(Fixed).as("term"))
        .groupBy(col("dst"))
        .agg(round(lit(tele) + lit(0.85) * sum(col("term")).cast("double"), 9)
          .as("p"))
        .select(col("dst").as("id"), col("p"))
        .localCheckpoint(false)
    }
    rank
  }

  /** The Jaccard threshold a dupgroups artifact was BUILT at, parsed
    * from its meta line — the rank join must filter pairs at exactly
    * this threshold or group members connected only by weaker edges
    * would silently drop from the rank.
    */
  private def groupsThreshold(spark: SparkSession, groupsDir: String): Double = {
    val meta = Artifact.readMeta(spark, groupsDir).getOrElse(
      throw new IllegalStateException(s"no artifact at $groupsDir"))
    "minJaccard=([0-9.]+)".r.findFirstMatchIn(meta) match {
      case Some(m) => m.group(1).toDouble
      case None => throw new IllegalStateException(
        s"no minJaccard in dupgroups meta at $groupsDir: $meta")
    }
  }

  /** Per duplicate group: the centrality-canonical member. Groups and
    * pairs are the persisted dedup artifacts; the pair threshold comes
    * from the groups artifact's own meta so the two can never diverge.
    * Output is `(group_id, canonical_id, n_members, score)` with ties
    * broken to the lower doc id. Singleton groups cannot occur (groups
    * exist only where pairs do).
    */
  def canonicalByRank(spark: SparkSession, pairDir: String,
                      groupsDir: String): DataFrame = {
    val rank = pagerank(Dedup.loadPairs(spark, pairDir,
      groupsThreshold(spark, groupsDir)))
    Dedup.loadGroups(spark, groupsDir)
      .join(rank, col("doc_id") === rank("id"))
      .groupBy(col("group_id"))
      .agg(count(lit(1)).as("n_members"),
        min(struct((-col("p")).as("a"), col("doc_id").as("b"))).as("m"))
      .select(col("group_id"), col("m.b").as("canonical_id"),
        col("n_members"), (-col("m.a")).as("score"))
      .orderBy(col("group_id"))
  }

  /** Corpus rewrite under the centrality keeper: every dup-group member
    * except the rank-canonical one drops — [[Dedup.applyDedupStored]]
    * with the principled keeper instead of min-id. Still one anti-join
    * of the corpus against a dup-graph-sized loser set.
    */
  def applyCanonical(spark: SparkSession, corpus: DataFrame,
                     pairDir: String, groupsDir: String): DataFrame = {
    val canon = canonicalByRank(spark, pairDir, groupsDir)
      .select(col("group_id"), col("canonical_id"))
    val losers = Dedup.loadGroups(spark, groupsDir)
      .join(canon, "group_id")
      .filter(col("doc_id") =!= col("canonical_id"))
      .select(col("doc_id"))
    corpus.join(losers, Seq("doc_id"), "left_anti")
  }
}

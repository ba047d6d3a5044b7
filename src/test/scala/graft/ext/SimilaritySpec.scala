package graft.ext

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  test("cosine: identical vectors → 1, orthogonal → 0") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 2.0f), 0.0),
      (Array(3.0f, 4.0f), Array(3.0f, 4.0f), 1.0)
    ).toDF("a", "b", "expected")
    val got = df.select(Similarity.cosine(col("a"), col("b")).as("cos"), col("expected"))
      .collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("brute-force top-k: k rows per query, cosine non-increasing") {
    val out = Similarity.bruteForceTopK(Tables.embeddings(spark, sfDir), 5, 4)
      .orderBy("q_id", "rank").collect()
    assert(out.length == 5 * 4)
    out.groupBy(_.getLong(0)).values.foreach { rows =>
      val cs = rows.sortBy(_.getInt(1)).map(_.getDouble(4))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  /** Synthetic clustered corpus: 10 well-separated centroids with small
    * noise — the regime ANN indexes exist for (the driver's fixture
    * embeddings are near-uniform random, where top-k is noise and no
    * sublinear index can beat brute force).
    */
  private def clusteredEmbeddings(n: Int = 200, dims: Int = 16) = {
    val rnd = new scala.util.Random(42)
    val centroids = Array.fill(10, dims)(rnd.nextGaussian())
    val rows = (0 until n).map { i =>
      val c = i % 10
      val v = centroids(c).map(x => (x + 0.05 * rnd.nextGaussian()).toFloat)
      (i.toLong, v, c)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("LSH ANN recall ≥ 0.6 vs brute force on clustered data") {
    val emb = clusteredEmbeddings()
    val exact = Similarity.bruteForceTopK(emb, 10, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, 10, 5, h = 8, tables = 4, dims = 16)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"LSH recall too low: $recall")
  }

  test("kmeans: deterministic, separates well-split directions") {
    // two tight direction bundles; k=2 must put one centroid in each
    val sample = Array(
      Array(1.0f, 0.01f), Array(1.0f, -0.01f), Array(0.99f, 0.02f),
      Array(0.01f, 1.0f), Array(-0.01f, 1.0f), Array(0.02f, 0.99f))
    val c1 = Similarity.kmeans(sample, 2)
    val c2 = Similarity.kmeans(sample, 2)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq, "must be deterministic")
    // each bundle's members are closest to a different centroid
    def nearest(v: Array[Float]) =
      c1.indices.maxBy(i => c1(i).zip(v).map { case (a, b) => a * b }.sum)
    assert(sample.take(3).map(nearest).distinct.length == 1)
    assert(sample.drop(3).map(nearest).distinct.length == 1)
    assert(nearest(sample(0)) != nearest(sample(3)))
    // k larger than the sample clamps instead of failing
    assert(Similarity.kmeans(sample.take(2), 5).length == 2)
  }

  test("l2Normalize: unit norms, direction preserved, zero vector safe") {
    val df = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"),
        Similarity.l2Normalize(col("embedding")).as("n"))
      .orderBy("vec_id").collect()
    val v1 = out(0).getSeq[Double](1)
    assert(math.abs(v1(0) - 0.6) < 1e-12 && math.abs(v1(1) - 0.8) < 1e-12)
    assert(out(1).getSeq[Double](1) == Seq(0.0, 0.0))
  }

  test("near-dup pairs are symmetric-free (a<b) and unique") {
    val pairs = Similarity.cosineNearDupPairs(Tables.embeddings(spark, sfDir), 20)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.length == pairs.length)
  }

  test("IVF ANN recall ≥ 0.6 vs brute force on clustered data") {
    val emb = clusteredEmbeddings()
    val exact = Similarity.bruteForceTopK(emb, 10, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(emb, 10, 5, nCells = 16, nprobe = 4)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall too low: $recall")
  }

  test("PQ ANN recall ≥ 0.6 vs brute force on clustered data") {
    val emb = clusteredEmbeddings()
    val exact = Similarity.bruteForceTopK(emb, 10, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.pqTopK(emb, 10, 5, m = 8, codesPerSub = 16, rerank = 50)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"PQ recall too low: $recall")
  }

  test("PQ plan: encode and ADC scoring are map-side — no nested loop join") {
    val plan = Similarity.pqTopK(clusteredEmbeddings(), 10, 5, m = 8,
        codesPerSub = 16, rerank = 50)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"PQ encode/score must not join against codebooks or queries:\n$plan")
  }

  test("IVF plan: cell assignment is map-side — no nested loop, no window exchange") {
    val plan = Similarity.ivfTopK(clusteredEmbeddings(), 10, 5, nCells = 16, nprobe = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"IVF assignment must not blow up rows against the centroid set:\n$plan")
    // the only ranking window allowed is the final top-k re-rank over
    // candidates — the nCells·N assignment argmax must stay map-side
    val windows = "RunningWindowFunction|Window\\b".r.findAllIn(plan).size
    assert(windows <= 1,
      s"IVF assignment argmax must not need a per-vector ranking window:\n$plan")
  }

  test("neighbors share the query's label on clustered data") {
    val emb = clusteredEmbeddings()
    val labels = emb.select("vec_id", "label").as[(Long, Int)].collect().toMap
    val out = Similarity.bruteForceTopK(emb, 10, 5)
      .select("q_id", "n_label").as[(Long, Int)].collect()
    val hits = out.count { case (q, nl) => labels(q) == nl }
    assert(hits.toDouble / out.length >= 0.9,
      s"top-k neighbors don't cluster by label: $hits/${out.length}")
  }

  /** Clustered corpus with exact-duplicate vectors planted: ids n..n+k
    * copy ids 0..k-1. Identical vectors land in the same k-means cell
    * (and the same SRP sub-bucket) by construction, so the pairs MUST
    * be recovered regardless of clustering quality.
    */
  private def withPlantedDups(k: Int) = {
    val base = clusteredEmbeddings()
    val n = base.count()
    val dups = base.filter(col("vec_id") < k)
      .withColumn("vec_id", col("vec_id") + lit(n))
    (base.unionByName(dups), (0 until k).map(i => (i.toLong, n + i)).toSet)
  }

  test("semantic dedup: planted duplicate pairs surface at cos 1.0") {
    val (emb, planted) = withPlantedDups(5)
    val pairs = Similarity.semanticTopKPairs(emb, nCells = 8, topK = 5, dims = 16)
      .select("a_id", "b_id", "cos").as[(Long, Long, Double)].collect()
    assert(pairs.length == 5)
    pairs.foreach { case (a, b, c) =>
      assert(planted((a, b)), s"unexpected top pair ($a,$b)")
      assert(c == 1.0, s"planted duplicate must score cosine 1.0, got $c")
    }
  }

  test("semantic dedup: maxCell sub-split guard keeps identical pairs") {
    val (emb, planted) = withPlantedDups(5)
    // every cell over cap → all comparisons run under SRP sub-buckets;
    // identical vectors share sub-buckets by construction
    val pairs = Similarity.semanticTopKPairs(emb, nCells = 8, topK = 5,
        maxCell = 2, subH = 4, dims = 16)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == planted,
      s"sub-split must preserve identical-vector pairs: got $pairs")
  }

  test("semantic dedup plan: no cartesian product, pairs never shuffle") {
    val (emb, _) = withPlantedDups(5)
    val q = Similarity.semanticTopKPairs(emb, nCells = 8, topK = 5, dims = 16)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"within-cell join must be keyed on (cell, sub):\n$plan")
    // top-K over the pair stream must be TakeOrderedAndProject (pairs
    // filtered/ranked in the join stage), not a global sort of all pairs
    assert(plan.contains("TakeOrderedAndProject"),
      s"pair top-K must not globally sort the pair stream:\n$plan")
  }

  test("semantic decon: a planted paraphrase is caught at a tight radius") {
    // benchmark item 100; corpus doc 7 is a PARAPHRASE — its embedding
    // is the benchmark vector under a tiny perturbation (cos ≈ 0.9996)
    // — exactly what the shingle-exact/Bloom gate cannot see. The
    // other corpus docs point elsewhere.
    val bench = Seq((100L, Array.tabulate(64)(i => if (i == 0) 1.0f else 0.01f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (7L, Array.tabulate(64)(i => if (i == 0) 0.97f else 0.0115f)),
      (8L, Array.tabulate(64)(i => if (i == 1) 1.0f else 0.0f)),
      (9L, Array.tabulate(64)(i => if (i == 2) -1.0f else 0.0f))
    ).toDF("vec_id", "embedding")
    val flagged = Similarity.semanticContamination(bench, corpus)
      .filter(col("cos") >= 0.99)
      .select("corpus_id", "bench_id").as[(Long, Long)].collect().toSeq
    assert(flagged == Seq((7L, 100L)),
      s"the paraphrase (and only it) must be flagged: $flagged")
    val kept = Similarity
      .removeSemanticContamination(bench, corpus, radius = 0.99)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(8L, 9L))
  }

  test("semantic decon plan: benchmark side broadcasts, corpus never shuffles for candidates") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = Similarity.semanticContamination(
      emb.filter(pmod(col("vec_id"), lit(10)) === 0),
      emb.filter(pmod(col("vec_id"), lit(10)) =!= 0))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must be a bucket equi-join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the eval-suite-sized benchmark side must broadcast:\n$plan")
  }
}

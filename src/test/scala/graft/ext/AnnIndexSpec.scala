package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.DataFrame

/** Persisted-ANN-index lifecycle: build once, serve from storage, prove
  * the search plan reads the index table (partition-pruned) and touches
  * the raw embedding column only at the exact rerank.
  */
class AnnIndexSpec extends SparkSuite {
  import spark.implicits._

  /** Same clustered corpus as SimilaritySpec — the regime ANN indexes
    * exist for.
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

  // fresh index dir per test-JVM run; parquet-backed corpus so plan
  // assertions see real file scans
  private lazy val base: String = {
    val d = new java.io.File("target/annspec")
    deleteRecursively(d.getPath)
    d.mkdirs()
    clusteredEmbeddings().write.mode("overwrite").parquet(s"${d.getPath}/emb")
    d.getPath
  }
  private lazy val emb: DataFrame = spark.read.parquet(s"$base/emb")

  private lazy val exactTopK: Set[(Long, Long)] =
    Similarity.bruteForceTopK(emb, 10, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet

  private def recallOf(df: DataFrame): Double = {
    val approx = df.select("q_id", "n_id").as[(Long, Long)].collect().toSet
    (exactTopK & approx).size.toDouble / exactTopK.size
  }

  /** Corpus scans in a search plan = occurrences of the corpus path. */
  private def corpusScans(df: DataFrame): Int =
    "annspec/emb".r.findAllIn(df.queryExecution.executedPlan.toString).size

  test("persisted IVF: recall ≥ 0.6 and stable across loads") {
    AnnIndex.ensureIvf(spark, emb, s"$base/ivf")
    val r1 = AnnIndex.searchIvf(spark, emb, s"$base/ivf").collect().toSeq
    val r2 = AnnIndex.searchIvf(spark, emb, s"$base/ivf").collect().toSeq
    assert(r1.toSet == r2.toSet, "two loads of the same index must agree")
    assert(recallOf(AnnIndex.searchIvf(spark, emb, s"$base/ivf")) >= 0.6)
  }

  test("IVF search plan: partition-pruned index scan, embeddings read only query-side + rerank") {
    AnnIndex.ensureIvf(spark, emb, s"$base/ivf")
    val res = AnnIndex.searchIvf(spark, emb, s"$base/ivf")
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell_id"),
      s"probed cells must prune assignment partitions statically:\n$plan")
    // exactly two corpus scans: the broadcast query side and the rerank
    // join — the candidate pipeline never reads the embedding column
    assert(corpusScans(res) == 2, s"expected 2 corpus scans:\n$plan")
  }

  test("ensureIvf is load-once: second call does not rebuild") {
    AnnIndex.ensureIvf(spark, emb, s"$base/ivf")
    val marker = new java.io.File(s"$base/ivf/assignments/_SUCCESS")
    val t1 = marker.lastModified()
    AnnIndex.ensureIvf(spark, emb, s"$base/ivf")
    assert(marker.lastModified() == t1, "index must not be rebuilt")
  }

  test("ensure rebuilds when parameters or the corpus change") {
    import org.apache.spark.sql.functions.{col, reverse}
    AnnIndex.ensureIvf(spark, emb, s"$base/ivf")
    val marker = new java.io.File(s"$base/ivf/assignments/_SUCCESS")
    val t1 = marker.lastModified()
    AnnIndex.ensureIvf(spark, emb, s"$base/ivf", nCells = 8)
    val t2 = marker.lastModified()
    assert(t2 != t1, "nCells change must rebuild the index")
    val perturbed = emb.withColumn("embedding", reverse(col("embedding")))
    AnnIndex.ensureIvf(spark, perturbed, s"$base/ivf", nCells = 8)
    assert(marker.lastModified() != t2, "corpus change must rebuild the index")
    // restore the canonical default index for any later test
    AnnIndex.ensureIvf(spark, emb, s"$base/ivf")
  }

  test("append (ivf/pq/ivfpq): batch appended without rebuild, additive fingerprint matches union") {
    import org.apache.spark.sql.functions.col
    val embA = emb.filter(col("vec_id") < 150)
    val embB = emb.filter(col("vec_id") >= 150)
    val cases = Seq[(String, String,
        (org.apache.spark.sql.DataFrame, String) => String,  // ensure
        (org.apache.spark.sql.DataFrame, String) => Unit,    // append
        (org.apache.spark.sql.DataFrame, String) => org.apache.spark.sql.DataFrame)](  // search
      ("ivf_append", "centroids",
        (e, d) => AnnIndex.ensureIvf(spark, e, d),
        (e, d) => AnnIndex.appendIvf(spark, e, d),
        (e, d) => AnnIndex.searchIvf(spark, e, d, nQueries = 10, k = 20)),
      ("pq_append", "codebook",
        (e, d) => AnnIndex.ensurePq(spark, e, d),
        (e, d) => AnnIndex.appendPq(spark, e, d),
        (e, d) => AnnIndex.searchPq(spark, e, d, nQueries = 10, k = 20, rerank = 100)),
      ("ivfpq_append", "centroids",
        (e, d) => AnnIndex.ensureIvfPq(spark, e, d),
        (e, d) => AnnIndex.appendIvfPq(spark, e, d),
        (e, d) => AnnIndex.searchIvfPq(spark, e, d, nQueries = 10, k = 20, rerank = 100)))
    cases.foreach { case (name, trainedTable, ensure, append, search) =>
      val dir = s"$base/$name"
      ensure(embA, dir)
      append(embB, dir)
      // ensure over the UNION corpus must serve, not rebuild: the stored
      // fingerprint was updated arithmetically (count/hash-sum additive)
      val marker = new java.io.File(s"$dir/$trainedTable/_SUCCESS")
      val t1 = marker.lastModified()
      ensure(emb, dir)
      assert(marker.lastModified() == t1,
        s"$name: union ensure must match the appended index without rebuilding")
      // appended vectors are retrievable: with k=20 on 10-cluster data,
      // every query's neighborhood includes high-id (appended) members
      assert(search(emb, dir).filter(col("n_id") >= 150).count() > 0,
        s"$name: appended vectors must appear among neighbors")
      // double-submitting the same batch is a no-op: ids already indexed
      // are dropped, the fingerprint still matches the union corpus
      append(embB, dir)
      val t2 = marker.lastModified()
      ensure(emb, dir)
      assert(marker.lastModified() == t2,
        s"$name: re-appending an ingested batch must not desync the fingerprint")
    }
  }

  test("append refuses the wrong index kind before writing anything") {
    import org.apache.spark.sql.functions.col
    val dir = s"$base/ivfpq_guard"
    AnnIndex.ensureIvfPq(spark, emb, dir)
    val before = new java.io.File(s"$dir/assignments").listFiles().length
    intercept[IllegalStateException] {
      AnnIndex.appendIvf(spark, emb.filter(col("vec_id") < 5), dir)
    }
    assert(new java.io.File(s"$dir/assignments").listFiles().length == before,
      "a refused append must not have touched the index files")
  }

  test("persisted SRP-LSH: recall ≥ 0.6, corpus hashed only at build time") {
    AnnIndex.ensureSrp(spark, emb, s"$base/srp", h = 8, tables = 4, dims = 16)
    val res = AnnIndex.searchSrp(spark, emb, s"$base/srp", h = 8, tables = 4, dims = 16)
    assert(recallOf(res) >= 0.6)
    // matches the in-memory SRP path exactly: same planes, same buckets,
    // same rerank — persistence must not change the result set
    val live = Similarity.lshTopK(emb, 10, 5, h = 8, tables = 4, dims = 16)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val stored = res.select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(stored == live, "persisted SRP search must equal the live SRP search")
    // 3 corpus scans: in-plan query bucket-hashing (vec_id-filtered),
    // the broadcast query side of the rerank (vec_id-filtered), and the
    // rerank join — i.e. two query-bounded reads + one rerank; the full
    // corpus is never re-hashed (the stored bucket table replaces it)
    assert(corpusScans(res) == 3, "corpus reads: 2 query-bounded + rerank only")
    assert(res.queryExecution.executedPlan.toString.contains("annspec/srp/buckets"),
      "candidates must come from the stored bucket table")
  }

  test("nprobe widens recall monotonically; probing every cell equals brute force") {
    AnnIndex.ensureIvf(spark, emb, s"$base/ivf")
    val r1 = recallOf(AnnIndex.searchIvf(spark, emb, s"$base/ivf", nprobe = 1))
    val r4 = recallOf(AnnIndex.searchIvf(spark, emb, s"$base/ivf", nprobe = 4))
    val r16 = recallOf(AnnIndex.searchIvf(spark, emb, s"$base/ivf", nprobe = 16))
    assert(r1 <= r4 && r4 <= r16, s"recall must widen with nprobe: $r1 / $r4 / $r16")
    // all 16 cells probed → candidate set is the whole corpus → the
    // exact rerank (same scoring + tie-break as bruteForceTopK) is exact
    assert(r16 == 1.0, s"full probing must equal brute force, got $r16")
  }

  test("append is insert-only: a resubmitted id with changed content fails fast") {
    import org.apache.spark.sql.functions.{col, reverse}
    val dir = s"$base/ivf_insertonly"
    AnnIndex.ensureIvf(spark, emb.filter(col("vec_id") < 150), dir)
    val metaBefore = Artifact.readMeta(spark, dir)
    val rowsBefore = spark.read.parquet(s"$dir/assignments").count()
    // same id 100, different embedding — the stale-serve scenario
    val changed = emb.filter(col("vec_id") === 100)
      .withColumn("embedding", reverse(col("embedding")))
    val e = intercept[IllegalStateException] {
      AnnIndex.appendIvf(spark, changed, dir)
    }
    assert(e.getMessage.contains("insert-only"), e.getMessage)
    assert(Artifact.readMeta(spark, dir) == metaBefore,
      "a refused append must not touch the metadata")
    assert(spark.read.parquet(s"$dir/assignments").count() == rowsBefore,
      "a refused append must not have written index rows")
    assert(!Artifact.hasPendingMutation(spark, dir),
      "the failure happens before the mutation marker — nothing to roll back")
  }

  test("crash mid-append forces a rebuild instead of serving stale metadata") {
    import org.apache.spark.sql.functions.col
    val dir = s"$base/ivf_crash"
    AnnIndex.ensureIvf(spark, emb.filter(col("vec_id") < 150), dir)
    // simulate a crash between the data append and the fingerprint bump:
    // the pending marker is on disk, the meta still matches the old corpus
    Artifact.beginMutation(spark, dir)
    intercept[IllegalStateException] {
      AnnIndex.appendIvf(spark, emb.filter(col("vec_id") >= 150), dir)
    }
    val marker = new java.io.File(s"$dir/assignments/_SUCCESS")
    val t1 = marker.lastModified()
    AnnIndex.ensureIvf(spark, emb.filter(col("vec_id") < 150), dir)
    assert(marker.lastModified() != t1,
      "ensure over a pending-marked index must rebuild even with matching meta")
    assert(!Artifact.hasPendingMutation(spark, dir))
  }

  test("compact: appended file sets shrink, meta verbatim, search results identical") {
    import org.apache.spark.sql.functions.col
    val dir = s"$base/ivf_manyappends"
    AnnIndex.ensureIvf(spark, emb.filter(col("vec_id") < 100), dir)
    (100 until 200 by 20).foreach { lo =>
      AnnIndex.appendIvf(spark,
        emb.filter(col("vec_id") >= lo && col("vec_id") < lo + 20), dir)
    }
    val metaBefore = Artifact.readMeta(spark, dir)
    val resBefore = AnnIndex.searchIvf(spark, emb, dir).collect().toSet
    val (f0, f1) = AnnIndex.compact(spark, dir)
    assert(f1 < f0, s"file count must drop: $f0 -> $f1")
    assert(Artifact.readMeta(spark, dir) == metaBefore,
      "compaction must preserve the metadata line verbatim")
    assert(AnnIndex.searchIvf(spark, emb, dir).collect().toSet == resBefore,
      "search results must be identical pre/post compaction")
    // the additive fingerprint still matches the union corpus
    val marker = new java.io.File(s"$dir/centroids/_SUCCESS")
    val t1 = marker.lastModified()
    AnnIndex.ensureIvf(spark, emb, dir)
    assert(marker.lastModified() == t1, "union ensure must still serve after compact")

    // flat (non-partitioned) layout: PQ codes
    val pqDir = s"$base/pq_manyappends"
    AnnIndex.ensurePq(spark, emb.filter(col("vec_id") < 100), pqDir)
    (100 until 200 by 20).foreach { lo =>
      AnnIndex.appendPq(spark,
        emb.filter(col("vec_id") >= lo && col("vec_id") < lo + 20), pqDir)
    }
    val pqBefore = AnnIndex.searchPq(spark, emb, pqDir).collect().toSet
    val (p0, p1) = AnnIndex.compact(spark, pqDir)
    assert(p1 < p0, s"pq file count must drop: $p0 -> $p1")
    assert(AnnIndex.searchPq(spark, emb, pqDir).collect().toSet == pqBefore)
  }

  test("drift: in-distribution batch stays quiet, shifted batch trips and rebuilds") {
    import org.apache.spark.sql.functions.{col, transform => arrTransform}
    val dir = s"$base/ivf_drift"
    deleteRecursively(dir)
    AnnIndex.ensureIvf(spark, emb, dir)
    // in-distribution: the same vectors under new ids
    val inDist = emb.withColumn("vec_id", col("vec_id") + 1000)
    val quiet = AnnIndex.ivfDrift(spark, inDist, dir)
    assert(!quiet.drifted(), s"in-distribution batch must not trip: $quiet")
    // shifted: negated vectors sit far from every stored centroid
    val shifted = emb.withColumn("vec_id", col("vec_id") + 2000)
      .withColumn("embedding", arrTransform(col("embedding"), x => -x))
    val loud = AnnIndex.ivfDrift(spark, shifted, dir)
    assert(loud.drifted(), s"shifted batch must trip the drift gate: $loud")
    assert(loud.qerrRatio > quiet.qerrRatio)

    // gated append: quiet batch appends (quantizer untouched), loud batch
    // rebuilds over the union (quantizer re-trained, fp = union corpus)
    val centMarker = new java.io.File(s"$dir/centroids/_SUCCESS")
    val t1 = centMarker.lastModified()
    AnnIndex.appendIvfOrRebuild(spark, inDist, emb.unionByName(inDist), dir)
    assert(centMarker.lastModified() == t1, "in-distribution batch must append")
    val union2 = emb.unionByName(inDist).unionByName(shifted)
    AnnIndex.appendIvfOrRebuild(spark, shifted, union2, dir)
    assert(centMarker.lastModified() != t1, "drifted batch must re-train the quantizer")
    val t2 = centMarker.lastModified()
    AnnIndex.ensureIvf(spark, union2, dir)
    assert(centMarker.lastModified() == t2,
      "post-rebuild metadata must match the union corpus")
  }

  test("persisted PQ: recall ≥ 0.6, ADC scans codes only") {
    AnnIndex.ensurePq(spark, emb, s"$base/pq")
    val res = AnnIndex.searchPq(spark, emb, s"$base/pq")
    assert(recallOf(res) >= 0.6)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("annspec/pq/codes"), s"must scan the code table:\n$plan")
    assert(corpusScans(res) == 2, s"expected 2 corpus scans (query + rerank):\n$plan")
  }

  test("persisted IVF-PQ: recall ≥ plain PQ, pruned + code-only scan") {
    AnnIndex.ensurePq(spark, emb, s"$base/pq")
    AnnIndex.ensureIvfPq(spark, emb, s"$base/ivfpq")
    val pqRecall = recallOf(AnnIndex.searchPq(spark, emb, s"$base/pq"))
    val res = AnnIndex.searchIvfPq(spark, emb, s"$base/ivfpq")
    val ivfpqRecall = recallOf(res)
    assert(ivfpqRecall >= pqRecall,
      s"residual PQ within cells must not lose recall: ivfpq=$ivfpqRecall pq=$pqRecall")
    // absolute floor, pinned: the relative bound alone would let a
    // quantizer regression hide behind both variants degrading together
    assert(ivfpqRecall >= 0.8,
      s"ivfpq recall at defaults (nprobe=4) must stay ≥ 0.8, got $ivfpqRecall")
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell_id"),
      s"probed cells must prune code partitions statically:\n$plan")
    assert(corpusScans(res) == 2, s"expected 2 corpus scans (query + rerank):\n$plan")
  }

  test("recall report: one row per variant, recall column equals the set intersection") {
    val root = s"$base/recall_idx"
    val rows = AnnIndex.recallReport(spark, emb, root, dims = 16)
      .orderBy("method").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("ivf", "ivfpq", "pq", "srp"))
    rows.foreach { r =>
      val (hits, truthPairs, recall) = (r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(r.getInt(1) == 10 && r.getInt(2) == 5, r.toString)
      assert(truthPairs == 50L, s"10 queries × top-5 truth pairs: $r")
      assert(hits >= 0L && hits <= truthPairs, r.toString)
      assert(recall >= 0.5 && recall <= 1.0,
        s"clustered corpus: every variant must clear 0.5, got $r")
      // the in-data quality gate: floor is the method's documented
      // regression alarm and pass must reflect recall ≥ floor (on this
      // clustered corpus every method clears its floor with margin)
      val (floor, pass) = (r.getDouble(6), r.getBoolean(7))
      assert(floor == AnnIndex.defaultRecallFloors(r.getString(0)), r.toString)
      assert(pass && recall >= floor, s"floor gate must pass: $r")
    }
    // the reported number IS recall: cross-check one variant against an
    // independently computed truth/approx set intersection
    val ivfReported = rows.find(_.getString(0) == "ivf").get.getDouble(5)
    val ivfIndependent = recallOf(AnnIndex.searchIvf(spark, emb, s"$root/ivf_c16"))
    assert(math.abs(ivfReported - ivfIndependent) < 1e-6,
      s"reported $ivfReported vs recomputed $ivfIndependent")
  }
}

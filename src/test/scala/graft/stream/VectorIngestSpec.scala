package graft.stream

import graft.SparkSuite
import graft.ext.{AnnIndex, Artifact}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, transform => arrTransform, xxhash64}

class VectorIngestSpec extends SparkSuite {
  import spark.implicits._

  private val root = "target/vecingestspec/root"

  /** Same clustered regime as AnnIndexSpec: 10 tight Gaussian clusters. */
  private def clustered(ids: Range, dims: Int = 16) = {
    val rnd = new scala.util.Random(42)
    val centroids = Array.fill(10, dims)(rnd.nextGaussian())
    ids.map { i =>
      val c = i % 10
      val v = centroids(c).map(x => (x + 0.05 * rnd.nextGaussian()).toFloat)
      (i.toLong, v.toSeq, c)
    }.toDF("vec_id", "embedding", "label")
  }

  private def freshRoot(): Unit = deleteRecursively("target/vecingestspec")

  private def corpusIds(): Set[Long] =
    VectorIngest.corpus(spark, root).select("vec_id").as[Long].collect().toSet

  test("in-distribution batch appends without re-training; admission is exactly-once") {
    freshRoot()
    VectorIngest.init(spark, clustered(0 until 150), root)
    val centMarker = new java.io.File(s"$root/ivf/centroids/_SUCCESS")
    val t1 = centMarker.lastModified()
    val s = VectorIngest.ingestBatch(spark, clustered(0 until 200).filter(col("vec_id") >= 150), root)
    assert(s.accepted == 50 && !s.rebuilt && s.drift.exists(!_.drifted()))
    assert(centMarker.lastModified() == t1, "quiet batch must not re-train the quantizer")
    assert(corpusIds() == (0L until 200L).toSet)
    // replay: everything skipped, nothing appended, fp line unchanged
    val meta = Artifact.readMeta(spark, root)
    val s2 = VectorIngest.ingestBatch(spark, clustered(0 until 200).filter(col("vec_id") >= 150), root)
    assert(s2 == VectorIngest.VectorIngestStats(50, 50, 0, 0, None, rebuilt = false))
    assert(Artifact.readMeta(spark, root) == meta)
    // the folded index is fingerprint-identical to a fresh build over the
    // final corpus: ensure must serve, not rebuild
    val ivfMarker = new java.io.File(s"$root/ivf/assignments/_SUCCESS")
    val tIdx = ivfMarker.lastModified()
    AnnIndex.ensureIvf(spark, VectorIngest.corpus(spark, root), s"$root/ivf")
    assert(ivfMarker.lastModified() == tIdx, "ensure over the union corpus must be a no-op")
  }

  test("content conflict (same id, new vector) is counted and skipped, not silently dropped") {
    freshRoot()
    VectorIngest.init(spark, clustered(0 until 150), root)
    val conflicted = clustered(0 until 150).filter(col("vec_id") < 10)
      .withColumn("embedding", arrTransform(col("embedding"), x => x + 1.0f))
    val s = VectorIngest.ingestBatch(spark, conflicted, root)
    assert(s == VectorIngest.VectorIngestStats(10, 0, 10, 0, None, rebuilt = false))
    // the stored vectors are untouched
    val storedHash = VectorIngest.corpus(spark, root).filter(col("vec_id") < 10)
      .select(xxhash64(col("embedding"), col("label"))).as[Long].collect().toSet
    val origHash = clustered(0 until 150).filter(col("vec_id") < 10)
      .select(xxhash64(col("embedding"), col("label"))).as[Long].collect().toSet
    assert(storedHash == origHash)
  }

  test("shifted batch trips the drift gate: quantizer re-trained over the union corpus") {
    freshRoot()
    VectorIngest.init(spark, clustered(0 until 150), root)
    val centMarker = new java.io.File(s"$root/ivf/centroids/_SUCCESS")
    val t1 = centMarker.lastModified()
    val shifted = clustered(0 until 50)
      .withColumn("vec_id", col("vec_id") + 2000)
      .withColumn("embedding", arrTransform(col("embedding"), x => -x))
    val s = VectorIngest.ingestBatch(spark, shifted, root)
    assert(s.rebuilt && s.drift.exists(_.drifted()), s"drift gate must trip: $s")
    assert(s.accepted == 50)
    assert(centMarker.lastModified() != t1, "drifted batch must re-train the quantizer")
    // post-rebuild, index metadata matches the union corpus exactly
    val ivfMarker = new java.io.File(s"$root/ivf/assignments/_SUCCESS")
    val tIdx = ivfMarker.lastModified()
    AnnIndex.ensureIvf(spark, VectorIngest.corpus(spark, root), s"$root/ivf")
    assert(ivfMarker.lastModified() == tIdx)
  }

  test("crash mid-mutation: ingest refuses, recover() rebuilds from the corpus store") {
    freshRoot()
    VectorIngest.init(spark, clustered(0 until 150), root)
    Artifact.beginMutation(spark, root)
    Artifact.beginMutation(spark, s"$root/ivf")
    intercept[IllegalStateException] {
      VectorIngest.ingestBatch(spark, clustered(150 until 200), root)
    }
    VectorIngest.recover(spark, root)
    val s = VectorIngest.ingestBatch(spark, clustered(0 until 200).filter(col("vec_id") >= 150), root)
    assert(s.accepted == 50)
    assert(corpusIds() == (0L until 200L).toSet)
  }

  test("removeVecs: vector gone from corpus and serves, re-insert gated on compaction") {
    freshRoot()
    VectorIngest.init(spark, clustered(0 until 150), root)
    VectorIngest.ingestBatch(spark, clustered(0 until 200).filter(col("vec_id") >= 150), root)
    assert(VectorIngest.removeVecs(spark, root, Seq(150L, 9999L).toDF("vec_id")) == 1L)
    assert(!corpusIds().contains(150L))
    // fingerprint lines equal a fresh fingerprint over what remains
    val c = VectorIngest.corpus(spark, root).localCheckpoint()
    val freshFp = Artifact.fingerprint(c, col("vec_id"), col("embedding"), col("label"))
    assert(Artifact.readMeta(spark, root).contains(s"vecingest v1 nCells=16 fp=$freshFp"))
    assert(Artifact.readMeta(spark, s"$root/ivf").contains(s"ivf v2 nCells=16 fp=$freshFp"))
    // the removed vector never surfaces from the masked index, even
    // probing every cell (its cluster siblings share its cell)
    val res = AnnIndex.searchIvf(spark, c, s"$root/ivf", nQueries = 10, k = 50, nprobe = 16)
    assert(res.filter(col("n_id") === 150L).isEmpty, "removed vector must not serve")
    // re-inserting the removed id before compaction is refused loudly
    val e = intercept[IllegalStateException] {
      VectorIngest.ingestBatch(spark, clustered(150 until 151), root)
    }
    assert(e.getMessage.contains("compact"))
    // the refusal happened before any mutation: the root stays clean
    assert(!Artifact.hasPendingMutation(spark, root))
    // compaction drops the masked rows physically; then the id is free
    VectorIngest.maintain(spark, root, maxFiles = 0)
    assert(spark.read.parquet(s"$root/ivf/assignments")
      .filter(col("vec_id") === 150L).isEmpty,
      "removed vector's index rows must be physically gone after compaction")
    val s = VectorIngest.ingestBatch(spark, clustered(150 until 151), root)
    assert(s.accepted == 1)
  }

  test("streamed vector ingestion: checkpointed batches fold in, maintain compacts") {
    freshRoot()
    VectorIngest.init(spark, clustered(0 until 100), root)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float], Int)]
    val stats = scala.collection.mutable.ArrayBuffer.empty[VectorIngest.VectorIngestStats]
    def drain(lo: Int, hi: Int): Unit = {
      input.addData(clustered(0 until 200).filter(col("vec_id") >= lo && col("vec_id") < hi)
        .as[(Long, Seq[Float], Int)].collect().toSeq: _*)
      val q = VectorIngest.start(spark,
        DirectSource(input.toDF().toDF("vec_id", "embedding", "label")),
        "target/vecingestspec/ckpt", root,
        onBatch = (_, s) => stats.synchronized { stats += s })
      q.awaitTermination()
    }
    drain(100, 150)
    drain(150, 200)
    assert(stats.map(_.accepted).sum == 100)
    assert(corpusIds() == (0L until 200L).toSet)
    val (before, after) = VectorIngest.maintain(spark, root, maxFiles = 1)
    assert(before > after, s"compaction must shrink the file count: $before -> $after")
    // the compacted index still serves: search finds streamed-in vectors
    val res = AnnIndex.searchIvf(spark, VectorIngest.corpus(spark, root), s"$root/ivf",
      nQueries = 5, k = 5, nprobe = 16)
    assert(res.count() > 0)
  }
}

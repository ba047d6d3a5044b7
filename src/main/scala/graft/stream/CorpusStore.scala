package graft.stream

import graft.ext.Artifact
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The source-of-truth store shared by the ingest roots
  * ([[IncrementalIngest]], [[VectorIngest]]): accepted rows live under
  * `<root>/corpus/batch=<fp>/`, one partition directory per ingested
  * batch, each COMMITTED BY RENAME from a fully-written staging path —
  * the atomic step that makes the crash model tractable (a crashed batch
  * leaves no partial corpus data, only an ignored staging directory, so
  * recovery can always rebuild derived state from the committed
  * directories alone).
  */
private[stream] object CorpusStore {

  private def corpusPath(root: String) = s"$root/corpus"
  private def stagingPath(root: String) = s"$root/corpus.staging"

  def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed rows, projected to the store's data columns (the `batch`
    * partition label is bookkeeping, not data).
    */
  def read(spark: SparkSession, root: String, cols: Seq[String]): DataFrame =
    spark.read.parquet(corpusPath(root)).select(cols.map(col): _*)

  /** Committed rows WITH the `batch` partition label — for operations
    * that need to locate which batch directories hold given rows
    * (deletion rewrites only the touched directories).
    */
  def readWithBatch(spark: SparkSession, root: String, cols: Seq[String]): DataFrame =
    spark.read.parquet(corpusPath(root))
      .select((cols :+ "batch").map(col): _*)

  /** Write the seed batch of a fresh root (build path — no staging
    * needed: the root has no metadata line yet, so a crash here is
    * rebuilt by init).
    */
  def writeSeed(spark: SparkSession, root: String, seed: DataFrame): Unit =
    seed.write.parquet(s"${corpusPath(root)}/batch=seed")

  /** Stage a batch's files fully — called BEFORE the mutation marker
    * goes up; nothing is committed yet.
    */
  def stage(spark: SparkSession, root: String, accepted: DataFrame): Unit = {
    val f = fs(spark, root)
    f.delete(new Path(stagingPath(root)), true)
    accepted.write.parquet(stagingPath(root))
  }

  /** Atomically commit the staged batch under its fingerprint label. */
  def commitStaged(spark: SparkSession, root: String, fp: String): Unit = {
    val f = fs(spark, root)
    val committed = new Path(s"${corpusPath(root)}/batch=${fp.replace(':', '_')}")
    if (!f.rename(new Path(stagingPath(root)), committed))
      throw new IllegalStateException(
        s"corpus batch commit failed: ${stagingPath(root)} -> $committed")
  }

  /** Drop any leftover staging directory (recovery path). */
  def discardStaging(spark: SparkSession, root: String): Unit =
    fs(spark, root).delete(new Path(stagingPath(root)), true)

  /** Replace one committed batch directory's rows (deletion path) —
    * loss-free at every instant: the remaining rows are written fully
    * OUTSIDE the corpus first, the old directory moves aside under a
    * name that remembers its origin (`corpus.old-<batch>`), the new one
    * moves in, then the aside copy is dropped. [[recoverLayout]] undoes
    * or completes an interrupted swap from the aside name. An empty
    * `remaining` deletes the directory outright (all rows removed).
    */
  def rewriteBatchDir(spark: SparkSession, root: String, batch: String,
                      remaining: DataFrame): Unit = {
    val f = fs(spark, root)
    val dir = new Path(s"${corpusPath(root)}/batch=$batch")
    val aside = new Path(s"$root/corpus.old-$batch")
    val rewrite = new Path(s"$root/corpus.rewrite")
    f.delete(rewrite, true)
    f.delete(aside, true)
    val n = remaining.count()
    if (n > 0) remaining.write.parquet(rewrite.toString)
    if (!f.rename(dir, aside))
      throw new IllegalStateException(s"could not move $dir aside")
    if (n > 0 && !f.rename(rewrite, dir))
      throw new IllegalStateException(s"could not commit rewritten $dir")
    f.delete(aside, true)
  }

  def parquetFiles(spark: SparkSession, dir: String): Int = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) 0
    else {
      val it = f.listFiles(p, true)
      var n = 0
      while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
  }

  def corpusFileCount(spark: SparkSession, root: String): Int =
    parquetFiles(spark, corpusPath(root))

  /** Rewrite all committed batch directories into one sized
    * `batch=compacted` set — the store is a plain union, so merging
    * partitions is consumer-invisible. Staged fully, then swapped by
    * two renames under the root's pending marker: the live corpus moves
    * ASIDE (`corpus.old`) before the compacted set moves in, so the
    * source of truth exists on disk at every instant of the swap —
    * a crash at any point is undone or completed by [[recoverLayout]].
    * The metadata line must be untouched (content is identical).
    * Returns (files before, after).
    */
  def compact(spark: SparkSession, root: String, cols: Seq[String],
              targetBytes: Long = 128L << 20): (Int, Int) = {
    val metaBefore = Artifact.readMeta(spark, root)
    val f = fs(spark, root)
    val before = corpusFileCount(spark, root)
    val bytes = f.getContentSummary(new Path(corpusPath(root))).getLength
    val nOut = math.max(1, ((bytes + targetBytes - 1) / targetBytes).toInt)
    val corpus = new Path(corpusPath(root))
    val compacting = new Path(s"$root/corpus.compacting")
    val old = new Path(s"$root/corpus.old")
    f.delete(compacting, true)
    f.delete(old, true)
    read(spark, root, cols).repartition(nOut)
      .write.parquet(s"$compacting/batch=compacted")
    Artifact.beginMutation(spark, root)
    if (!f.rename(corpus, old) || !f.rename(compacting, corpus))
      throw new IllegalStateException("corpus compaction swap failed mid-way — " +
        "the pending marker is set; recoverLayout restores the store")
    f.delete(old, true)
    Artifact.endMutation(spark, root)
    assert(Artifact.readMeta(spark, root) == metaBefore,
      "corpus compaction must not touch the metadata line")
    (before, corpusFileCount(spark, root))
  }

  /** Restore the corpus directory layout after a crash (recovery path,
    * called before any read of the store): a swap that stopped between
    * its two renames is rolled back (`corpus.old` → `corpus`), one that
    * stopped before its cleanup keeps the already-complete new corpus
    * and drops the old copy; staging and compacting leftovers are
    * discarded. After this, `corpus/` is guaranteed to hold the full
    * committed content.
    */
  def recoverLayout(spark: SparkSession, root: String): Unit = {
    val f = fs(spark, root)
    val corpus = new Path(corpusPath(root))
    val old = new Path(s"$root/corpus.old")
    if (!f.exists(corpus) && f.exists(old)) {
      if (!f.rename(old, corpus))
        throw new IllegalStateException(s"could not restore $old to $corpus")
    } else if (f.exists(old)) {
      f.delete(old, true)  // new corpus complete; old copy is surplus
    }
    // per-batch-dir rewrite swaps (deletion path): an aside copy whose
    // target directory is missing is restored (swap undone — the
    // deletion replays); one whose target exists is surplus
    if (f.exists(new Path(root))) {
      f.listStatus(new Path(root)).foreach { s =>
        val name = s.getPath.getName
        if (name.startsWith("corpus.old-")) {
          val target = new Path(s"${corpusPath(root)}/batch=${name.stripPrefix("corpus.old-")}")
          if (!f.exists(target)) {
            if (!f.rename(s.getPath, target))
              throw new IllegalStateException(s"could not restore ${s.getPath} to $target")
          } else f.delete(s.getPath, true)
        }
      }
    }
    f.delete(new Path(s"$root/corpus.rewrite"), true)
    f.delete(new Path(s"$root/corpus.compacting"), true)
    discardStaging(spark, root)
  }
}

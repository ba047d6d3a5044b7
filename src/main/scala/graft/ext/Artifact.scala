package graft.ext

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build-once / serve-many parquet artifacts guarded by a metadata line
  * (build parameters + input fingerprint). The pattern behind the
  * persisted ANN indexes ([[AnnIndex]]) and the near-dup pair table
  * ([[Dedup.ensurePairs]]): a pipeline stage whose output many queries
  * consume is materialized once, and any parameter or input change
  * triggers a rebuild — stale artifacts can never be served silently.
  *
  * Mutation safety: appends and compactions run under a *pending marker*
  * ([[beginMutation]]/[[endMutation]]) written before the first
  * destructive file operation and cleared only after the metadata is
  * consistent again. A crash mid-mutation leaves the marker on disk;
  * [[ensure]] treats a marked artifact as stale (rebuild) and
  * [[requireKind]] refuses to serve or append to it — a half-finished
  * append can never be served against pre-append metadata.
  */
private[graft] object Artifact {

  /** Artifact root for a fixture dir, keyed by its basename so sf0.01
    * and sf0.1 never share artifacts. Lives under target/.
    */
  def root(sfDir: String): String =
    s"target/artifacts/${new java.io.File(sfDir).getName}"

  /** Input fingerprint: row count + order-independent hash over the
    * identifying columns — one narrow scan, no shuffle. NOTE: the
    * hash-sum is additive (exploited by the append paths) but thereby
    * collision-weakened — a freshness guard, never a correctness check.
    *
    * Session-memoized for deterministic, fully FILE-BACKED frames
    * (r18 optimization): every artifact serve pays this scan for its
    * freshness check, and one bench session fingerprints the same
    * handful of fixture-derived frames 60+ times. When the frame's
    * content is provably a pure function of its input files
    * ([[org.apache.spark.sql.graftbridge.bridge.deterministicFileKey]]:
    * all leaves are file relations, no non-deterministic expression),
    * the result is memoized under (session, canonical plan, columns,
    * input file paths+sizes+mtimes). A rewritten input can never
    * collide with its old key — Spark part-file names are unique per
    * write, and size/mtime guard hand-written files — so a memo hit is
    * exactly the value a recompute would produce. Non-file-backed or
    * non-deterministic plans (localCheckpoints, in-memory test frames,
    * rand()) always recompute, and so do scans over more than 4096
    * input files (per-file stat cost would rival the scan).
    */
  def fingerprint(df: DataFrame, cols: Column*): String = {
    def compute(): String = {
      val r = df.agg(count(lit(1)), sum(xxhash64(cols: _*))).head()
      s"${r.getLong(0)}:${if (r.isNullAt(1)) 0L else r.getLong(1)}"
    }
    deterministicMemoKey(df, cols.mkString(",")) match {
      case Some(key) => fpMemo.getOrElseUpdate(key, compute())
      case None => compute()
    }
  }

  /** The (session, canonical plan, tag, input file paths+sizes+mtimes)
    * memo key behind [[fingerprint]]'s session memo, exposed for other
    * deterministic per-input guards (e.g. [[MediaDedup]]'s id-headroom
    * check): `Some(key)` exactly when a memo hit is provably the value
    * a recompute would produce — the frame is a deterministic function
    * of its input files and the file listing pins data identity.
    */
  private[ext] def deterministicMemoKey(df: DataFrame, tag: String): Option[String] =
    org.apache.spark.sql.graftbridge.bridge.deterministicFileKey(df).flatMap { planKey =>
      val files = df.inputFiles
      if (files.isEmpty || files.length > 4096) None
      else {
        val conf = df.sparkSession.sparkContext.hadoopConfiguration
        val listing = files.sorted.map { f =>
          val p = new Path(f)
          val st = p.getFileSystem(conf).getFileStatus(p)
          s"$f:${st.getLen}:${st.getModificationTime}"
        }.mkString("|")
        Some(java.util.UUID.nameUUIDFromBytes(
          (System.identityHashCode(df.sparkSession).toString + "§" + planKey + "§" +
            tag + "§" + listing).getBytes("UTF-8")).toString)
      }
    }

  // fingerprint memo: value strings are tiny; growth is bounded by
  // distinct (plan, file-set) pairs ever fingerprinted in the JVM
  private val fpMemo = scala.collection.concurrent.TrieMap.empty[String, String]

  /** File-level fingerprint over input table paths: a digest of every
    * file's (path relative to its input root, size, modification time) —
    * zero data scanned. The right freshness proxy for large immutable
    * source tables, where any regeneration rewrites files; use
    * [[fingerprint]] (content hash) when inputs can mutate in place.
    */
  def fileFingerprint(spark: SparkSession, paths: String*): String = {
    val entries = paths.flatMap { dir =>
      val p = new Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Seq(s"missing:$dir")
      else {
        // keys carry the FULL path relative to the fingerprinted root
        // (not the bare file name): moving a file between nested subdirs
        // of the same input — or between inputs — must change the digest
        val rootStr = fs.getFileStatus(p).getPath.toString
        def walk(s: org.apache.hadoop.fs.FileStatus): Seq[String] =
          if (s.isDirectory) fs.listStatus(s.getPath).toSeq.flatMap(walk)
          else {
            val rel = s.getPath.toString.stripPrefix(rootStr)
            Seq(s"$dir$rel:${s.getLen}:${s.getModificationTime}")
          }
        walk(fs.getFileStatus(p))
      }
    }
    // md5-based name-UUID keeps the meta line short and deterministic
    java.util.UUID.nameUUIDFromBytes(
      entries.sorted.mkString("|").getBytes("UTF-8")).toString
  }

  private def fsPath(spark: SparkSession, dir: String, name: String): (FileSystem, Path) = {
    val p = new Path(dir, name)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def metaFile(spark: SparkSession, dir: String): (FileSystem, Path) =
    fsPath(spark, dir, "index_meta.txt")

  def readMeta(spark: SparkSession, dir: String): Option[String] = {
    val (fs, p) = metaFile(spark, dir)
    if (!fs.exists(p)) None
    else {
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(fs.open(p)))
      try Option(in.readLine()) finally in.close()
    }
  }

  /** Written last, after a successful build — a crashed build leaves no
    * meta and is rebuilt on the next ensure.
    */
  def writeMeta(spark: SparkSession, dir: String, meta: String): Unit = {
    val (fs, p) = metaFile(spark, dir)
    val out = fs.create(p, true)
    try out.write(meta.getBytes("UTF-8")) finally out.close()
  }

  // ------------------------------------------------- mutation marker

  private def pendingFile(spark: SparkSession, dir: String): (FileSystem, Path) =
    fsPath(spark, dir, "mutation_pending")

  /** True iff a mutation (append/compaction) started but never
    * finished — the artifact's data may not match its metadata line.
    */
  def hasPendingMutation(spark: SparkSession, dir: String): Boolean = {
    val (fs, p) = pendingFile(spark, dir)
    fs.exists(p)
  }

  /** Mark the artifact as mid-mutation BEFORE the first destructive file
    * operation of an append or compaction. Until [[endMutation]], the
    * artifact is neither served ([[requireKind]] throws) nor trusted by
    * [[ensure]] (which rebuilds) — so a crash between a data append and
    * its fingerprint bump forces a rebuild instead of silently serving
    * appended rows under pre-append metadata.
    */
  def beginMutation(spark: SparkSession, dir: String): Unit = {
    val (fs, p) = pendingFile(spark, dir)
    fs.create(p, true).close()
  }

  def endMutation(spark: SparkSession, dir: String): Unit = {
    val (fs, p) = pendingFile(spark, dir)
    fs.delete(p, false)
  }

  private val FpRe = """(.+) fp=(-?\d+):(-?\d+)""".r

  /** Assert the artifact at `dir` exists, finished its last mutation,
    * and is of the expected kind / parameterization — call BEFORE any
    * destructive append, and from serve paths whose own parameters must
    * match the build's (a mismatched serve would silently return
    * near-empty results, which is exactly what the metadata line exists
    * to prevent).
    */
  def requireKind(spark: SparkSession, dir: String, requirePrefix: String): Unit = {
    if (hasPendingMutation(spark, dir))
      throw new IllegalStateException(
        s"artifact at $dir has an unfinished append/compaction — re-ensure to rebuild")
    readMeta(spark, dir) match {
      case Some(meta) if meta.startsWith(requirePrefix) => ()
      case other =>
        throw new IllegalStateException(s"no '$requirePrefix' artifact at $dir: $other")
    }
  }

  /** Arithmetic fingerprint update for append-style artifacts: the
    * content [[fingerprint]] (count + hash-sum) is additive over
    * disjoint row sets, so appending a batch only needs the batch's own
    * fingerprint added onto the stored one — no scan of the existing
    * data. `requirePrefix` guards against bumping the wrong artifact
    * kind.
    */
  def addToFingerprint(spark: SparkSession, dir: String,
                       requirePrefix: String, batchFp: String): Unit =
    adjustFingerprint(spark, dir, requirePrefix, batchFp, 1L)

  /** The removal mirror of [[addToFingerprint]]: additivity works both
    * ways, so deleting a known row set subtracts its fingerprint — the
    * stored line ends up equal to a fresh [[fingerprint]] over the
    * remaining content, and `ensure` keeps serving without a rescan.
    */
  def subtractFromFingerprint(spark: SparkSession, dir: String,
                              requirePrefix: String, removedFp: String): Unit =
    adjustFingerprint(spark, dir, requirePrefix, removedFp, -1L)

  private def adjustFingerprint(spark: SparkSession, dir: String,
                                requirePrefix: String, fp: String, sign: Long): Unit = {
    val Array(bc, bs) = fp.split(":").map(_.toLong)
    readMeta(spark, dir) match {
      case Some(FpRe(prefix, c, s)) if prefix.startsWith(requirePrefix) =>
        writeMeta(spark, dir, s"$prefix fp=${c.toLong + sign * bc}:${s.toLong + sign * bs}")
      case other =>
        throw new IllegalStateException(s"no '$requirePrefix' artifact at $dir: $other")
    }
  }

  /** Build-if-needed: serve as long as the stored metadata line matches
    * `meta` and no mutation was left unfinished; rebuild otherwise. The
    * fingerprint inside `meta` costs one narrow input scan per ensure —
    * amortized over the many queries a built artifact serves.
    */
  def ensure(spark: SparkSession, dir: String, meta: String)(build: => Unit): String =
    ensureLockFor(dir).synchronized {
      if (hasPendingMutation(spark, dir) || !readMeta(spark, dir).contains(meta)) {
        build
        endMutation(spark, dir)
        writeMeta(spark, dir, meta)
      }
      dir
    }

  /** Per-directory build lock (r18 advice): the parallel warm phase
    * runs `ensure` chains concurrently, and chain/directory
    * disjointness was a hand-maintained comment-level invariant — a
    * future regrouping that lands two ensures of one dir in different
    * chains would race build/endMutation/writeMeta and could corrupt an
    * artifact silently. One JVM-wide lock object per normalized dir
    * makes concurrent ensures of the same artifact serialize (the
    * second call then sees the fresh meta and no-ops); distinct dirs
    * stay fully parallel.
    */
  private val ensureLocks =
    scala.collection.concurrent.TrieMap.empty[String, AnyRef]
  private def ensureLockFor(dir: String): AnyRef = {
    val key = new Path(dir).toString
    ensureLocks.putIfAbsent(key, new Object)
    ensureLocks(key)
  }

  // ------------------- generation ledger + logical deletion (shared
  // by the band index and the unigram LM: any append-mode artifact
  // whose rows belong to documents and must support removal)

  private def genPath(spark: SparkSession, dir: String): (FileSystem, Path) =
    fsPath(spark, dir, "genct.txt")

  /** The generation the NEXT append will stamp its rows with. Every
    * stored row's gen is strictly below it — which is exactly what
    * makes `tgen = readNextGen()` at removal time mask all rows that
    * exist and none that are inserted later (the LSM sequence-number
    * rule).
    */
  def readNextGen(spark: SparkSession, dir: String): Long = {
    val (fs, p) = genPath(spark, dir)
    if (!fs.exists(p)) 1L
    else {
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(fs.open(p)))
      try in.readLine().trim.toLong finally in.close()
    }
  }

  def writeNextGen(spark: SparkSession, dir: String, g: Long): Unit = {
    val (fs, p) = genPath(spark, dir)
    val out = fs.create(p, true)
    try out.write(g.toString.getBytes("UTF-8")) finally out.close()
  }

  private def tombstonePath(spark: SparkSession, dir: String): (FileSystem, Path) =
    fsPath(spark, dir, "tombstones")

  /** Logically-deleted `(doc_id, tgen)` rows of an artifact (empty
    * frame when none): a tombstone masks the doc's rows with
    * `gen < tgen` — its state as of the removal — and nothing inserted
    * after. Consumers mask gen-stamped tables via [[maskTombstones]];
    * the set stays bounded because compaction drops the masked rows
    * physically and clears it ([[clearTombstones]]).
    */
  def loadTombstones(spark: SparkSession, dir: String): DataFrame = {
    val (fs, p) = tombstonePath(spark, dir)
    if (fs.exists(p)) spark.read.parquet(p.toString)
    else spark.range(0).select(col("id").as("doc_id"), col("id").as("tgen"))
  }

  def hasTombstones(spark: SparkSession, dir: String): Boolean = {
    val (fs, p) = tombstonePath(spark, dir)
    fs.exists(p)
  }

  def clearTombstones(spark: SparkSession, dir: String): Unit = {
    val (fs, p) = tombstonePath(spark, dir)
    fs.delete(p, true)
  }

  /** Fold newly removed `(doc_id, tgen)` rows into the stored tombstone
    * set via max-merge (a doc removed twice keeps the later tgen).
    * Tombstones are tiny — bounded by removals since the last
    * compaction — so the set is rewritten wholesale via a staging swap.
    */
  def appendTombstones(spark: SparkSession, dir: String, removed: DataFrame): Unit = {
    val (fs, p) = tombstonePath(spark, dir)
    val union = loadTombstones(spark, dir)
      .unionByName(removed.select(col("doc_id"), col("tgen")))
      .groupBy(col("doc_id")).agg(max(col("tgen")).as("tgen"))
      .localCheckpoint()
    val tmp = new Path(s"$dir/tombstones.next")
    fs.delete(tmp, true)
    union.coalesce(1).write.parquet(tmp.toString)
    fs.delete(p, true)
    if (!fs.rename(tmp, p))
      throw new IllegalStateException(s"tombstone swap failed at $dir")
  }

  /** Mask a gen-stamped frame (must carry `doc_id` and `gen`) against
    * the artifact's tombstones: rows with `gen < tgen` — written before
    * their doc's removal — are dropped; rows re-inserted after it
    * survive. A no-op plan (no join, no broadcast) in the common
    * nothing-deleted case.
    */
  def maskTombstones(spark: SparkSession, dir: String, df: DataFrame): DataFrame =
    if (!hasTombstones(spark, dir)) df
    else df.join(broadcast(loadTombstones(spark, dir)), Seq("doc_id"), "left")
      .filter(col("tgen").isNull || col("gen") >= col("tgen"))
      .drop("tgen")

  /** Rewrite one data subdirectory of a built artifact into sized files
    * — the maintenance pass behind the append lifecycle (each appended
    * batch leaves its own file set; a nightly pipeline degrades into a
    * small-files problem without compaction). Content and the metadata
    * line are unchanged: `partitionCols` keep the partitioned directory
    * layout (one file per partition value), `sortCols` keep a
    * range-partitioned sorted layout, and an optional `merge` transform
    * may rewrite rows ONLY into a consumer-equivalent form (e.g. summing
    * per-bucket size deltas). The new file set is written fully before
    * the swap, and the swap runs under the pending marker — a crash
    * mid-swap forces a rebuild instead of serving a half-compacted
    * layout. Returns (parquet files before, after).
    */
  def compactParquet(spark: SparkSession, dir: String, sub: String,
                     partitionCols: Seq[String] = Nil, sortCols: Seq[String] = Nil,
                     merge: DataFrame => DataFrame = identity,
                     targetBytes: Long = 128L << 20): (Int, Int) = {
    if (hasPendingMutation(spark, dir))
      throw new IllegalStateException(
        s"artifact at $dir has an unfinished append — compacting would bake " +
          "the inconsistency in and clear the marker; re-ensure first")
    val metaBefore = readMeta(spark, dir)
    require(metaBefore.isDefined, s"no artifact at $dir to compact")
    val (fs, dataPath) = fsPath(spark, dir, sub)
    def parquetFiles(p: Path): Int = {
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
    val before = parquetFiles(dataPath)
    val bytes = fs.getContentSummary(dataPath).getLength
    val nOut = math.max(1, ((bytes + targetBytes - 1) / targetBytes).toInt)
    val df = merge(spark.read.parquet(dataPath.toString))
    val (_, tmp) = fsPath(spark, dir, s"$sub.compacting")
    fs.delete(tmp, true)
    val writer =
      if (partitionCols.nonEmpty)
        // hash on the partition columns: each partition value lands in
        // exactly one task → one file per partition directory
        df.repartition(nOut, partitionCols.map(col): _*)
          .write.partitionBy(partitionCols: _*)
      else if (sortCols.nonEmpty)
        df.repartitionByRange(nOut, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*).write
      else df.repartition(nOut).write
    writer.mode("overwrite").parquet(tmp.toString)
    beginMutation(spark, dir)
    fs.delete(dataPath, true)
    if (!fs.rename(tmp, dataPath))
      throw new IllegalStateException(s"compaction rename failed: $tmp -> $dataPath")
    endMutation(spark, dir)
    assert(readMeta(spark, dir) == metaBefore,
      "compaction must not touch the metadata line")
    (before, parquetFiles(dataPath))
  }
}

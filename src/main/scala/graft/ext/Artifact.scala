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
  */
private[graft] object Artifact {

  /** Artifact root for a fixture dir, keyed by its basename so sf0.01
    * and sf0.1 never share artifacts. Lives under target/.
    */
  def root(sfDir: String): String =
    s"target/artifacts/${new java.io.File(sfDir).getName}"

  /** Input fingerprint: row count + order-independent hash over the
    * identifying columns — one narrow scan, no shuffle.
    */
  def fingerprint(df: DataFrame, cols: Column*): String = {
    val r = df.agg(count(lit(1)), sum(xxhash64(cols: _*))).head()
    s"${r.getLong(0)}:${if (r.isNullAt(1)) 0L else r.getLong(1)}"
  }

  /** File-level fingerprint over input table paths: a digest of every
    * file's (name, size, modification time) — zero data scanned. The
    * right freshness proxy for large immutable source tables, where any
    * regeneration rewrites files; use [[fingerprint]] (content hash)
    * when inputs can mutate in place.
    */
  def fileFingerprint(spark: SparkSession, paths: String*): String = {
    val entries = paths.flatMap { dir =>
      val p = new Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // entries are keyed by (input path, file name): relocating a file
      // between fingerprinted inputs must change the digest
      def walk(s: org.apache.hadoop.fs.FileStatus): Seq[String] =
        if (s.isDirectory) fs.listStatus(s.getPath).toSeq.flatMap(walk)
        else Seq(s"$dir/${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      if (fs.exists(p)) walk(fs.getFileStatus(p)) else Seq(s"missing:$dir")
    }
    // md5-based name-UUID keeps the meta line short and deterministic
    java.util.UUID.nameUUIDFromBytes(
      entries.sorted.mkString("|").getBytes("UTF-8")).toString
  }

  private def metaFile(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir, "index_meta.txt")
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

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

  private val FpRe = """(.+) fp=(-?\d+):(-?\d+)""".r

  /** Assert the artifact at `dir` exists and is of the expected kind /
    * parameterization — call BEFORE any destructive append, and from
    * serve paths whose own parameters must match the build's (a
    * mismatched serve would silently return near-empty results, which
    * is exactly what the metadata line exists to prevent).
    */
  def requireKind(spark: SparkSession, dir: String, requirePrefix: String): Unit =
    readMeta(spark, dir) match {
      case Some(meta) if meta.startsWith(requirePrefix) => ()
      case other =>
        throw new IllegalStateException(s"no '$requirePrefix' artifact at $dir: $other")
    }

  /** Arithmetic fingerprint update for append-style artifacts: the
    * content [[fingerprint]] (count + hash-sum) is additive over
    * disjoint row sets, so appending a batch only needs the batch's own
    * fingerprint added onto the stored one — no scan of the existing
    * data. `requirePrefix` guards against bumping the wrong artifact
    * kind.
    */
  def addToFingerprint(spark: SparkSession, dir: String,
                       requirePrefix: String, batchFp: String): Unit = {
    val Array(bc, bs) = batchFp.split(":").map(_.toLong)
    readMeta(spark, dir) match {
      case Some(FpRe(prefix, c, s)) if prefix.startsWith(requirePrefix) =>
        writeMeta(spark, dir, s"$prefix fp=${c.toLong + bc}:${s.toLong + bs}")
      case other =>
        throw new IllegalStateException(s"no '$requirePrefix' artifact at $dir: $other")
    }
  }

  /** Build-if-needed: serve as long as the stored metadata line matches
    * `meta`; rebuild otherwise. The fingerprint inside `meta` costs one
    * narrow input scan per ensure — amortized over the many queries a
    * built artifact serves.
    */
  def ensure(spark: SparkSession, dir: String, meta: String)(build: => Unit): String = {
    if (!readMeta(spark, dir).contains(meta)) { build; writeMeta(spark, dir, meta) }
    dir
  }
}

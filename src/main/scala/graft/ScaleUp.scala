package graft

import org.apache.spark.sql.functions._

/** Synthesizes a ~10× scale point from an existing fixture dir so the
  * bench can measure a scaling slope without new source data: fact
  * tables are replicated `factor`× with key-consistent shifts, dims stay
  * untouched (more transactions over the same customers — the realistic
  * growth shape). Fact tables are written as `factor` min(32) files, not
  * whatever single partition the small source read produced: a scale
  * fixture in ONE parquet file caps every map stage at one task
  * (row groups are the split floor), which measures the fixture's
  * shape, not the operator's — at 100 TB the input arrives as
  * thousands of splits and map work parallelizes by construction.
  * Usage:
  *   runMain graft.ScaleUp [srcDir] [outDir] [factor]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")

    val reps = explode(sequence(lit(0), lit(factor - 1))).as("rep")
    val nFiles = math.min(32, math.max(factor, 2))
    def maxOf(table: String, key: String): Long =
      spark.read.parquet(s"$src/$table.parquet")
        .agg(max(col(key))).head().getAs[Number](0).longValue() + 1

    // orders/lineitem: replicate with the orderkey shifted per replica so
    // the o⋈l join structure is preserved replica-by-replica while keys
    // stay unique; custkey/suppkey untouched → dims are shared.
    val okShift = maxOf("orders", "o_orderkey")
    spark.read.parquet(s"$src/orders.parquet")
      .select(col("*"), reps)
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * okShift)
      .drop("rep")
      .repartition(nFiles)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    spark.read.parquet(s"$src/lineitem.parquet")
      .select(col("*"), reps)
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * okShift)
      .drop("rep")
      .repartition(nFiles)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // documents: per-replica token renaming — each replica keeps the
    // original corpus's internal near-dup structure but never matches
    // across replicas (shingle sets are disjoint), so dedup work scales
    // like "factor× more of the same corpus", not a quadratic blowup of
    // planted duplicates.
    val docShift = maxOf("documents", "doc_id")
    spark.read.parquet(s"$src/documents.parquet")
      .select(col("*"), reps)
      .withColumn("doc_id", col("doc_id") + col("rep") * docShift)
      .withColumn("text", when(col("rep") === 0, col("text"))
        .otherwise(array_join(transform(split(col("text"), " "),
          t => concat(t, lit("~"), col("rep"))), " ")))
      .drop("rep")
      .repartition(nFiles)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // embeddings: replicate with shifted ids and a per-replica sign-flip
    // pattern on the components — norm-preserving (within-replica cosine
    // structure is exactly the original's) while corresponding vectors
    // across replicas decorrelate (random-sign inner product ≈ 0), so
    // semantic-dedup work scales like "factor× more of the same corpus"
    // rather than planting factor-sized duplicate groups.
    // earlier layouts symlinked embeddings into the scale fixture: the
    // link must go (as a link — Fs.deleteTree never follows) BEFORE the
    // overwrite-mode write, or Hadoop's recursive delete would reach
    // through it into the source fixture
    Fs.deleteTree(s"$out/embeddings.parquet")
    val vecShift = maxOf("embeddings", "vec_id")
    spark.read.parquet(s"$src/embeddings.parquet")
      .select(col("*"), reps)
      .withColumn("vec_id", col("vec_id") + col("rep") * vecShift)
      .withColumn("embedding", zip_with(
        col("embedding"),
        transform(sequence(lit(0), size(col("embedding")) - 1),
          d => when(col("rep") =!= 0 && pmod(xxhash64(col("rep"), d), lit(2)) === 0,
            lit(-1.0f)).otherwise(lit(1.0f))),
        (x, s) => x * s))
      .drop("rep")
      .repartition(nFiles)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // events: replicate with shifted ids and a one-hour-per-replica
    // timestamp stagger — factor× more activity from the SAME users
    // (dims stay shared, so enrichment joins keep matching), replicas
    // landing on nearby but not identical instants: distinct-(user,
    // day) structure grows a little, per-occurrence volume grows
    // factor× — the realistic event-growth shape for the KMV /
    // retention / funnel family. ts rides as the raw nanos long
    // (nanosAsLong=true session), so the stagger is plain long math
    // and Tables.normalizeEvents keeps handling the re-read.
    // The slot may hold a symlink from the earlier linked layout —
    // remove it as a LINK first (Fs.deleteTree never follows), or the
    // overwrite write would reach through into the source fixture.
    Fs.deleteTree(s"$out/events.parquet")
    val evShift = maxOf("events", "event_id")
    val evRaw = spark.read.parquet(s"$src/events.parquet")
      .select(col("*"), reps)
      .withColumn("event_id", col("event_id") + col("rep") * evShift)
    val evShifted = evRaw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        evRaw.withColumn("ts",
          col("ts") + col("rep") * lit(3600L * 1000L * 1000L * 1000L))
      case _ =>
        evRaw.withColumn("ts",
          col("ts") + expr("make_interval(0, 0, 0, 0, rep, 0, 0)"))
    }
    evShifted.drop("rep")
      .repartition(nFiles)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    // everything else links back to the source fixture
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach { t =>
        val link = java.nio.file.Paths.get(s"$out/$t.parquet")
        // a previous run (or a layout change between replicated and
        // linked table sets) may have left a real directory here —
        // deleteIfExists alone would throw DirectoryNotEmptyException
        if (java.nio.file.Files.isDirectory(link,
            java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath))
              Option(f.listFiles).foreach(_.foreach(rm))
            f.delete()
          }
          rm(link.toFile)
        } else java.nio.file.Files.deleteIfExists(link)
        java.nio.file.Files.createSymbolicLink(link,
          java.nio.file.Paths.get(s"$src/$t.parquet").toAbsolutePath)
      }
    println(s"[scaleup] wrote $out factor=$factor (orderkey shift $okShift, doc shift $docShift)")
    spark.stop()
  }
}

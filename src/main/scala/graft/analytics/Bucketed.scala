package graft.analytics

import graft.Tables
import graft.ext.Artifact
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Co-located (bucketed) fact⋈fact join — the documented fallback for
  * joins whose both sides grow with the data (`Enrich.salesEnriched`:
  * "at scale these two tables would be co-bucketed on the order key to
  * eliminate it"), made real instead of aspirational: lineitem and
  * orders written ONCE as warehouse tables bucketed (and sorted) by
  * the join key, so every subsequent join on that key is exchange-free
  * — each bucket pair meets a sort-merge join already partitioned and
  * sorted. At 100 TB this converts the biggest recurring shuffle
  * (fact⋈fact, both sides shuffled per query) into a one-time layout
  * cost amortized over every downstream join, exactly like the
  * persisted ANN/pair artifacts amortize their builds.
  *
  * Freshness follows the artifact pattern: the bucketed tables carry a
  * file-fingerprint metadata line; a regenerated fixture rebuilds them.
  */
object Bucketed {

  private def safe(s: String) = s.replaceAll("[^A-Za-z0-9_]", "_")

  /** Per-fixture table names — sf0.01 and sf0.1 must never share. */
  def tableNames(dir: String): (String, String) = {
    val fx = safe(new java.io.File(dir).getName)
    (s"li_bkt_$fx", s"ord_bkt_$fx")
  }

  /** Write lineitem + orders bucketed/sorted by the order key (once per
    * fixture content — guarded like every other artifact). `buckets`
    * would be sized to cluster width in deployment; what matters is
    * that BOTH tables use the same count so partitioning is compatible.
    *
    * Catalog lifetime: with the in-memory catalog, table REGISTRATIONS
    * die with the JVM while managed-table directories persist — so a
    * fresh session must rebuild even when the content fingerprint still
    * matches (registration is gone), and the rebuild must drop the
    * orphaned warehouse directories first or `saveAsTable` refuses the
    * location. On a deployment with a persistent metastore the
    * fingerprint line alone decides.
    */
  def ensureTables(spark: SparkSession, dir: String, buckets: Int = 8): Unit = {
    val (liName, ordName) = tableNames(dir)
    val root = s"${Artifact.root(dir)}/bucketed"
    val meta = s"bucketed v1 buckets=$buckets fp=${Artifact.fileFingerprint(spark,
      s"$dir/lineitem.parquet", s"$dir/orders.parquet")}"
    val registered = spark.catalog.tableExists(liName) && spark.catalog.tableExists(ordName)
    val anyRegistered = spark.catalog.tableExists(liName) || spark.catalog.tableExists(ordName)
    // Fresh-session fast path: the bucketed FILES persist under the
    // warehouse, but the in-memory catalog forgets them with the app —
    // a full two-table rewrite per session for byte-identical data.
    // When the metadata line still matches the source files, re-declare
    // the tables over the existing files (same bucket/sort spec
    // saveAsTable recorded; the writer's bucket-id file naming is what
    // the declared spec expects), paying a listing instead of a write.
    // BucketedJoinSpec's zero-Exchange plan pin fails loud if a
    // re-registration ever lies about the layout.
    // Gated on NEITHER table being registered: with exactly one still
    // registered as a MANAGED table, the fast path's DROP would delete
    // its warehouse directory and re-declare an external table over the
    // now-empty location — a silently empty bucketed table. The partial
    // state falls through to the full rebuild below instead.
    if (!anyRegistered && !Artifact.hasPendingMutation(spark, root) &&
        Artifact.readMeta(spark, root).contains(meta)) {
      val warehouse = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"))
      val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val specs = Seq(liName -> "l_orderkey", ordName -> "o_orderkey")
      if (specs.forall { case (t, _) =>
            fs.exists(new org.apache.hadoop.fs.Path(warehouse, t)) }) {
        specs.foreach { case (t, key) =>
          val loc = new org.apache.hadoop.fs.Path(warehouse, t).toString
          val ddl = spark.read.parquet(loc).schema.toDDL
          spark.sql(s"DROP TABLE IF EXISTS $t")
          spark.sql(
            s"""CREATE TABLE $t ($ddl) USING PARQUET
               |CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
               |LOCATION '$loc'""".stripMargin)
        }
        return
      }
    }
    if (!registered || Artifact.hasPendingMutation(spark, root) ||
        !Artifact.readMeta(spark, root).contains(meta)) {
      val warehouse = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"))
      val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // marker up BEFORE the first destructive op: on a persistent
      // metastore a crash between the two saveAsTable calls must read as
      // mid-mutation (the hasPendingMutation clause above), not as a
      // servable pair of tables
      Artifact.beginMutation(spark, root)
      Seq(liName, ordName).foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        fs.delete(new org.apache.hadoop.fs.Path(warehouse, t), true)
      }
      Tables.lineitem(spark, dir)
        .write.mode("overwrite")
        .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(liName)
      Tables.orders(spark, dir)
        .write.mode("overwrite")
        .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ordName)
      Artifact.endMutation(spark, root)
      Artifact.writeMeta(spark, root, meta)
    }
  }

  /** Revenue by order priority off the bucketed layout. The merge hint
    * pins the join strategy (a broadcast would hide the point at test
    * scale); with both sides bucketed on the key, the join itself plans
    * with ZERO exchanges — the only shuffle left is the final
    * aggregation's (different key). Plan-asserted in `BucketedSpec`.
    */
  def salesByPriority(spark: SparkSession, dir: String): DataFrame = {
    ensureTables(spark, dir)
    val (liName, ordName) = tableNames(dir)
    val li = spark.table(liName)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val ord = spark.table(ordName)
      .select(col("o_orderkey"), col("o_orderpriority"))
    li.hint("merge")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        Tables.drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** The same logical query off the raw parquet (merge-hinted too):
    * the comparison plan that PAYS the two join exchanges the bucketed
    * layout eliminates. Used by the spec to assert the difference.
    */
  def salesByPriorityUnbucketed(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
    li.hint("merge")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        Tables.drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }
}

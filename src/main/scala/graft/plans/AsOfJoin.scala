package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.bridge

/** Whole-operator as-of join — custom-operator ladder step (c): a
  * logical plan node, a planner [[SparkStrategy]], and a physical
  * [[AsOfJoinExec]], registered through `SparkSessionExtensions`
  * ([[graft.functions.GraftExtensions]] injects the strategy).
  *
  * Spark has no as-of join operator; the composed formulation
  * ([[graft.analytics.AsOf]], union + `last(_, ignoreNulls)` window) is
  * ladder step (a) and already costs only one shuffle — but it pays a
  * union materialization, null-padded columns on both sides, and a
  * window evaluator walking every (key, time) frame. This node plans the
  * textbook merge as-of join instead:
  *
  *  - `requiredChildDistribution` co-partitions both sides on the key
  *    (one hash exchange each — Catalyst's EnsureRequirements inserts
  *    them, and AQE coalesces the two shuffles with one spec, exactly as
  *    it does for a sort-merge equi-join);
  *  - `requiredChildOrdering` sorts each partition by (key, time);
  *  - `doExecute` zips the co-partitioned sorted iterators and runs a
  *    single forward merge pass: per left row, advance the right cursor
  *    while `rightTime <= leftTime` within the key group, carrying the
  *    last-seen payload. O(|L| + |R|) per partition, flat memory (one
  *    held payload row), no union blowup, no window state.
  *
  * Semantics match DuckDB/kdb ASOF LEFT JOIN: inclusive boundary
  * (`rightTime <= leftTime`), unmatched left rows null-padded, NULL keys
  * and NULL times never match (SQL equality, unlike a window
  * partition-by, which would group NULL keys together).
  */
case class AsOfJoinPlan(
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    payload: Seq[Attribute],
    left: LogicalPlan, right: LogicalPlan,
    hint: String = "auto") extends BinaryNode {
  require(Set("auto", "merge", "broadcast")(hint), s"unknown as-of hint: $hint")
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override def maxRows: Option[Long] = left.maxRows

  /** Output cardinality is exactly the left side's (left rows pass
    * through once, null-padded or enriched) — without this override the
    * default visitor multiplies the children's sizes, and those
    * inflated stats stop Catalyst broadcasting anything downstream of
    * an as-of join. Width ≈ left width + payload, bounded here by 2×.
    */
  override def stats: org.apache.spark.sql.catalyst.plans.logical.Statistics =
    org.apache.spark.sql.catalyst.plans.logical.Statistics(
      sizeInBytes = left.stats.sizeInBytes * 2,
      rowCount = left.stats.rowCount)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Column pruning through [[AsOfJoinPlan]] — an injected optimizer
  * `Rule[LogicalPlan]`. Catalyst's own ColumnPruning cannot see through
  * a node it doesn't know, so without this rule an as-of join reads
  * every column of both children even when the query projects two. The
  * rule inserts pruning Projects under the join (keys/times/payload plus
  * whatever the parent Project references); it runs inside the operator-
  * optimization fixed point, so built-in ColumnPruning then pushes those
  * Projects all the way into the scans (`ReadSchema` narrows — at
  * 100 TB that's the difference between scanning 2 columns and 16).
  */
class AsOfJoinPruning extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, j: AsOfJoinPlan) =>
      val needed = AttributeSet(projList.flatMap(_.references)) ++
        j.leftKey.references ++ j.leftTime.references ++
        j.rightKey.references ++ j.rightTime.references ++
        AttributeSet(j.payload)
      val keepL = j.left.output.filter(needed.contains)
      val keepR = j.right.output.filter(needed.contains)
      if (keepL.length < j.left.output.length ||
          keepR.length < j.right.output.length) {
        p.copy(child = j.copy(
          left = if (keepL.length < j.left.output.length) Project(keepL, j.left) else j.left,
          right = if (keepR.length < j.right.output.length) Project(keepR, j.right) else j.right))
      } else p
  }
}

/** Plans [[AsOfJoinPlan]] → [[BroadcastAsOfJoinExec]] when the right
  * side is hinted broadcast or fits under
  * `spark.sql.autoBroadcastJoinThreshold` (the 100 TB case: the fact
  * side never shuffles or sorts for a small dimension history), else
  * the co-partitioned merge [[AsOfJoinExec]]. Inert on every other node.
  */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val broadcastable = j.hint == "broadcast" || (j.hint == "auto" &&
        threshold > 0 && j.right.stats.sizeInBytes <= threshold)
      if (broadcastable)
        BroadcastAsOfJoinExec(j.leftKey, j.leftTime, j.rightKey, j.rightTime,
          j.payload, planLater(j.left), planLater(j.right)) :: Nil
      else
        AsOfJoinExec(j.leftKey, j.leftTime, j.rightKey, j.rightTime,
          j.payload, planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    payload: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  // Left rows pass through in place: partitioning and ordering survive,
  // so a downstream groupBy/join on the same key plans no new exchange.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey; val ltm = leftTime
    val rk = rightKey; val rtm = rightTime
    val pay = payload
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val lktProj = UnsafeProjection.create(Seq(lk, ltm), lOut)
      val rktProj = UnsafeProjection.create(Seq(rk, rtm), rOut)
      val payProj = UnsafeProjection.create(pay, rOut)
      // Bind against the null-padded output schema (payload nullable) —
      // binding against the right side's original non-nullable attrs
      // would codegen away the null check and read garbage from the pad
      // row instead of NULL.
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullPay = new GenericInternalRow(pay.size)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // The forward-merge state: the latest in-window payload and the key
      // it belongs to. One row, regardless of history length per key.
      var heldKey: Any = null
      var heldPay: InternalRow = null
      lIter.map { lrow =>
        val kt = lktProj(lrow)
        if (kt.isNullAt(0) || kt.isNullAt(1)) {
          outProj(joined(lrow, nullPay))
        } else {
          val lkv = kt.get(0, keyType)
          val ltv = kt.get(1, timeType)
          var scan = true
          while (scan && rBuf.hasNext) {
            val rkt = rktProj(rBuf.head)
            if (rkt.isNullAt(0) || rkt.isNullAt(1)) {
              rBuf.next() // NULL key/time can never match: drop
            } else {
              val rkv = rkt.get(0, keyType)
              val c = keyOrd.compare(rkv, lkv)
              if (c < 0) {
                rBuf.next() // right key already passed by the sorted left
              } else if (c == 0 &&
                  timeOrd.compare(rkt.get(1, timeType), ltv) <= 0) {
                // In-window right row: becomes the held candidate. Copies
                // are required — projection buffers are reused per call.
                heldKey = InternalRow.copyValue(rkv)
                heldPay = payProj(rBuf.head).copy()
                rBuf.next()
              } else {
                scan = false // future key or future time: stop here
              }
            }
          }
          if (heldPay != null && keyOrd.compare(heldKey, lkv) == 0)
            outProj(joined(lrow, heldPay))
          else outProj(joined(lrow, nullPay))
        }
      }
    }
  }
}

/** Broadcast as-of join: the right (dimension-history) side is
  * broadcast whole (`IdentityBroadcastMode`) and indexed per task as
  * key → time-sorted payload list; each left row does one hash lookup +
  * binary search (last entry with `time <= leftTime`). The left side
  * keeps whatever partitioning it has — no exchange, no sort — which at
  * 100 TB is the difference between shuffling the fact table and not
  * touching it. Same semantics as [[AsOfJoinExec]]: inclusive boundary,
  * NULLs never match, unmatched rows null-padded.
  */
case class BroadcastAsOfJoinExec(
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    payload: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution ::
      org.apache.spark.sql.catalyst.plans.physical.BroadcastDistribution(
        org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey; val ltm = leftTime
    val rk = rightKey; val rtm = rightTime
    val pay = payload
    val outAttrs = output
    val bc = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions { lIter =>
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val rktProj = UnsafeProjection.create(Seq(rk, rtm), rOut)
      val payProj = UnsafeProjection.create(pay, rOut)
      // Index build is per task — acceptable for a broadcast-sized dim;
      // a dim too big to index per task is one the strategy should not
      // have broadcast (threshold/hint decide).
      val index = new java.util.HashMap[Any, scala.collection.mutable.ArrayBuffer[(Any, InternalRow)]]()
      bc.value.foreach { rrow =>
        val kt = rktProj(rrow)
        if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
          val k = InternalRow.copyValue(kt.get(0, keyType))
          val t = InternalRow.copyValue(kt.get(1, timeType))
          var buf = index.get(k)
          if (buf == null) {
            buf = new scala.collection.mutable.ArrayBuffer[(Any, InternalRow)]()
            index.put(k, buf)
          }
          buf += ((t, payProj(rrow).copy()))
        }
      }
      val it = index.values().iterator()
      while (it.hasNext) {
        val buf = it.next()
        // Stable sort: equal-time entries keep broadcast order, and the
        // binary search returns the last of them (same tie behavior as
        // the merge exec's "last consumed wins").
        val sorted = buf.sortBy(_._1)(timeOrd)
        buf.clear(); buf ++= sorted
      }
      val lktProj = UnsafeProjection.create(Seq(lk, ltm), lOut)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullPay = new GenericInternalRow(pay.size)
      val joined = new JoinedRow
      lIter.map { lrow =>
        val kt = lktProj(lrow)
        if (kt.isNullAt(0) || kt.isNullAt(1)) {
          outProj(joined(lrow, nullPay))
        } else {
          val buf = index.get(kt.get(0, keyType))
          if (buf == null) outProj(joined(lrow, nullPay))
          else {
            val ltv = kt.get(1, timeType)
            // rightmost entry with time <= ltv
            var lo = 0; var hi = buf.length - 1; var ans = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (timeOrd.compare(buf(mid)._1, ltv) <= 0) { ans = mid; lo = mid + 1 }
              else hi = mid - 1
            }
            if (ans < 0) outProj(joined(lrow, nullPay))
            else outProj(joined(lrow, buf(ans)._2))
          }
        }
      }
    }
  }
}

/** Public API over the native operator. */
object NativeAsOf {

  /** Most-recent-prior join via [[AsOfJoinPlan]]. Mirrors
    * [[graft.analytics.AsOf.join]]'s signature and semantics so the two
    * formulations are drop-in interchangeable (and spec-compared).
    * `hint`: "auto" (strategy broadcasts under the session threshold),
    * "merge", or "broadcast".
    */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           payloadCols: Seq[String], hint: String = "auto"): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    // Align right key/time types with the left side up front (e.g. DATE
    // order dates against TIMESTAMP event times) so the merge compares
    // one type with one ordering.
    val rightAligned = right
      .withColumn(rightKey, col(rightKey).cast(left.schema(leftKey).dataType))
      .withColumn(rightTime, col(rightTime).cast(left.schema(leftTime).dataType))
    val lPlan = bridge.analyzed(left)
    val rPlan = bridge.analyzed(rightAligned)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    bridge.ofRows(spark, AsOfJoinPlan(
      attr(lPlan, leftKey), attr(lPlan, leftTime),
      attr(rPlan, rightKey), attr(rPlan, rightTime),
      payloadCols.map(attr(rPlan, _)),
      lPlan, rPlan, hint))
  }

  /** Idempotent safety net for sessions built without
    * `spark.sql.extensions=graft.functions.GraftExtensions`: add the
    * strategy to the session's extra strategies. (Extension injection is
    * the deployment path; this covers ad hoc sessions, mirroring
    * `graft.functions.native.registerAll`.)
    */
  def ensureStrategy(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[AsOfJoinStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ new AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[AsOfJoinPruning]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new AsOfJoinPruning
  }
}

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
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
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

/** Plans [[AsOfJoinPlan]] → [[AsOfJoinExec]]; inert on every other node. */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(lk, lt, rk, rt, pay, l, r) =>
      AsOfJoinExec(lk, lt, rk, rt, pay, planLater(l), planLater(r)) :: Nil
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

/** Public API over the native operator. */
object NativeAsOf {

  /** Most-recent-prior join via [[AsOfJoinPlan]]. Mirrors
    * [[graft.analytics.AsOf.join]]'s signature and semantics so the two
    * formulations are drop-in interchangeable (and spec-compared).
    */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           payloadCols: Seq[String]): DataFrame = {
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
      lPlan, rPlan))
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

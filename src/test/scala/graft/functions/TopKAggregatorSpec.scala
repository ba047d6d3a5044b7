package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.functions._

/** The codegen-native [[TopKPackedAgg]] must be row-for-row equal to
  * the typed [[TopKAggregator]] it replaced in the a8 query path —
  * same ordering (measure desc, id asc), same `array<struct<_1,_2>>`
  * shape, same bounded-k truncation — and must fail LOUD outside its
  * packed domain.
  */
class TopKAggregatorSpec extends SparkSuite {
  import spark.implicits._

  private def typedTopK(k: Int): (Column, Column) => Column = {
    val a = udaf(TopKAggregator(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    (m, i) => a(m, i)
  }

  test("topk_packed_agg ≡ typed TopKAggregator: ties, truncation, small groups") {
    // group 1: 6 entries with tied measures (id asc breaks), k=3 truncates
    // group 2: fewer than k entries
    // group 3: exactly k, inserted in adversarial order
    val rows = Seq(
      (1L, 10L, 101L), (1L, 10L, 100L), (1L, 12L, 105L),
      (1L, 10L, 99L), (1L, 7L, 50L), (1L, 12L, 106L),
      (2L, 5L, 1L), (2L, 3L, 2L),
      (3L, 1L, 9L), (3L, 3L, 7L), (3L, 2L, 8L)
    ).toDF("g", "m", "id")
    def run(agg: (Column, Column) => Column) = rows
      .groupBy(col("g")).agg(agg(col("m"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("g"), col("pos"), col("e._1").as("m"), col("e._2").as("id"))
      .orderBy(col("g"), col("pos"))
      .as[(Long, Int, Long, Long)].collect().toSeq
    val packed = run(native.topk_packed_agg(_, _, 3))
    val typed = run(typedTopK(3))
    assert(packed == typed, s"\npacked: $packed\ntyped:  $typed")
    // pin the expected ordering independently of either implementation
    assert(packed.filter(_._1 == 1L).map(r => (r._3, r._4)) ==
      Seq((12L, 105L), (12L, 106L), (10L, 99L)))
    assert(packed.filter(_._1 == 2L).map(r => (r._3, r._4)) ==
      Seq((5L, 1L), (3L, 2L)))
    assert(packed.filter(_._1 == 3L).map(r => (r._3, r._4)) ==
      Seq((3L, 7L), (2L, 8L), (1L, 9L)))
  }

  test("topk_packed_agg: k=1, null rows skipped, plans as HashAggregate") {
    val df = Seq(
      (1L, Some(9L), Some(1L)), (1L, None, Some(2L)), (1L, Some(9L), None),
      (1L, Some(4L), Some(0L))
    ).toDF("g", "m", "id")
    val out = df.groupBy(col("g"))
      .agg(native.topk_packed_agg(col("m"), col("id"), 1).as("top"))
    val r = out.select(explode(col("top")).as("e"))
      .select(col("e._1"), col("e._2")).as[(Long, Long)].collect().toSeq
    assert(r == Seq((9L, 1L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") &&
      !plan.contains("ObjectHashAggregate") && !plan.contains("SortAggregate"),
      s"expected codegen HashAggregate, got:\n$plan")
  }

  test("topk_packed_agg: out-of-domain measure/id fails loud") {
    val big = Seq((1L, 1L << 31, 5L)).toDF("g", "m", "id")
    val e = intercept[Exception] {
      big.groupBy(col("g"))
        .agg(native.topk_packed_agg(col("m"), col("id"), 2)).collect()
    }
    assert(e.getMessage != null)
    val negId = Seq((1L, 3L, -1L)).toDF("g", "m", "id")
    intercept[Exception] {
      negId.groupBy(col("g"))
        .agg(native.topk_packed_agg(col("m"), col("id"), 2)).collect()
    }
  }
}

package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded k-minimum-values sketch buffer as a typed [[Aggregator]] —
  * the STREAMING-legal form of the KMV distinct estimator
  * (`Kpis.genreKpisKmv` is the batch twin): neither `distinct()` nor
  * rank windows compose with a streaming aggregation, but a bounded
  * mergeable buffer does. Each partial aggregate keeps at most the k
  * smallest DISTINCT hashes, so a group's distinct-count estimate
  * crosses the shuffle — and lives in streaming state — in O(k),
  * regardless of stream length (the property that serves daily
  * uniques off a 100 TB stream without unbounded dedup state).
  *
  * `finish` emits `(n_seen, hk)`: when `n_seen < k` the buffer IS the
  * group's whole distinct set (exact count, hk = −1); otherwise hk is
  * the k-th smallest distinct hash and the caller applies the same
  * half-up integral `(k−1)·2⁶⁰ / hk` estimate as the batch twin, so
  * ONE DuckDB oracle form replays both. The buffer is a pure function
  * of the input SET (sorted, distinct, capped; merge is a linear
  * dedup-merge), so the result is deterministic at any parallelism,
  * batch split, or arrival order.
  */
case class KmvAggregator(k: Int)
    extends Aggregator[Long, Seq[Long], (Long, Long)] {
  require(k >= 2, s"KMV needs k >= 2: $k")

  // Invariant: buffers stay sorted ascending, distinct and ≤ k long —
  // reduce is a bounded O(k) insertion, merge a linear dedup-merge.
  override def zero: Seq[Long] = Seq.empty

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] =
    if (buf.size >= k && h >= buf.last) buf
    else {
      val i = buf.indexWhere(_ >= h)
      if (i >= 0 && buf(i) == h) buf
      else {
        val ins = if (i < 0) buf :+ h else (buf.take(i) :+ h) ++ buf.drop(i)
        if (ins.size > k) ins.take(k) else ins
      }
    }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    val out = Seq.newBuilder[Long]
    var xs = a; var ys = b
    var n = 0
    var last = Long.MinValue
    var first = true
    while (n < k && (xs.nonEmpty || ys.nonEmpty)) {
      val v =
        if (ys.isEmpty || (xs.nonEmpty && xs.head <= ys.head)) {
          val v = xs.head; xs = xs.tail; v
        } else { val v = ys.head; ys = ys.tail; v }
      if (first || v != last) { out += v; last = v; n += 1; first = false }
    }
    out.result()
  }

  override def finish(buf: Seq[Long]): (Long, Long) =
    (buf.size.toLong, if (buf.size == k) buf.last else -1L)

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[(Long, Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

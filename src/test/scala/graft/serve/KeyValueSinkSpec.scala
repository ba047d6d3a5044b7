package graft.serve

import graft.SparkSuite
import graft.serve.KeyValueSink.{BatchWriter, KvItem}

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** The in-memory stand-in for the external KV service. local[*] runs
  * executors in the driver JVM, so a JVM-global store observes every
  * partition's writes; on a real cluster the writer would hold a network
  * client instead (the factory seam is the same).
  */
object FakeKvService {
  val store = new ConcurrentHashMap[(String, String), String]()
  val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
  val failuresToInject = new AtomicInteger(0)

  def reset(): Unit = { store.clear(); batchSizes.clear(); failuresToInject.set(0) }

  class Writer extends BatchWriter {
    override def putBatch(items: Seq[KvItem]): Unit = {
      if (failuresToInject.getAndUpdate(n => math.max(n - 1, 0)) > 0)
        throw new RuntimeException("injected transient failure")
      batchSizes.add(items.size)
      items.foreach(i => store.put((i.pk, i.sk), i.value))
    }
  }
}

class KeyValueSinkSpec extends SparkSuite {
  import spark.implicits._

  private def items(n: Int) =
    (1 to n).map(i => (f"PK#${i % 7}", f"SK#$i%04d", s"v$i", "t"))
      .toDF("pk", "sk", "value", "record_type")
      .repartition(3)

  test("K3 sink: every row written once, all chunks within the 25-item limit") {
    FakeKvService.reset()
    KeyValueSink.write(items(103), () => new FakeKvService.Writer, backoffMs = 0L)
    assert(FakeKvService.store.size() == 103)
    assert(FakeKvService.store.get(("PK#1", "SK#0001")) == "v1")
    val sizes = FakeKvService.batchSizes.toArray(Array.empty[Integer]).map(_.toInt)
    assert(sizes.sum == 103)
    assert(sizes.forall(_ <= KeyValueSink.DynamoBatchLimit), sizes.mkString(","))
  }

  test("K3 sink: transient batch failures are retried, nothing is lost") {
    FakeKvService.reset()
    FakeKvService.failuresToInject.set(2)
    KeyValueSink.write(items(60), () => new FakeKvService.Writer, backoffMs = 0L)
    assert(FakeKvService.store.size() == 60)
  }

  test("K3 sink: replay is idempotent — same keys, same values, same size") {
    FakeKvService.reset()
    KeyValueSink.write(items(50), () => new FakeKvService.Writer, backoffMs = 0L)
    val first = new java.util.HashMap(FakeKvService.store)
    KeyValueSink.write(items(50), () => new FakeKvService.Writer, backoffMs = 0L)
    assert(FakeKvService.store == first)
  }

  test("K3 sink: serving table loads through the sink (end-to-end shape)") {
    FakeKvService.reset()
    val serving = KeyValue.servingTable(spark, sfDir)
    val n = serving.count()
    KeyValueSink.write(serving, () => new FakeKvService.Writer, backoffMs = 0L)
    assert(FakeKvService.store.size() == n) // (pk, sk) is a true key
  }
}

package graft.serve

import org.apache.spark.sql.{DataFrame, Row}

/** K3 write side: the serving-store batch loader — the reference's
  * DynamoDB ingestion (`glue_jobs/dynamodb-ingestion.py:133-167`)
  * re-expressed as a distributed `foreachPartition` sink.
  *
  * The reference collects every reshaped record into one Python list and
  * writes 25-item batches sequentially from a single process. At 100 TB
  * the item stream must never pass through the driver: each partition
  * opens its own client, drains its own rows in ≤25-item chunks (the
  * DynamoDB BatchWriteItem limit), and retries transient failures with
  * bounded backoff locally — write bandwidth scales with executor count
  * and a retry stalls one partition, not the job.
  *
  * Exactly-once story: the store is keyed (pk, sk) with put-=-upsert
  * semantics, so a replayed task (Spark re-runs failed tasks wholesale)
  * rewrites the same keys to the same values — idempotent, matching the
  * reference's `put_item` overwrite behavior. Asserted in
  * `KeyValueSinkSpec`.
  */
object KeyValueSink {

  /** One serving-store item (the reference's DynamoDB item shape:
    * key grammar `README.md:121-129`).
    */
  final case class KvItem(pk: String, sk: String, value: String, recordType: String)

  /** The client seam: one batch-write attempt (e.g. a DynamoDB
    * BatchWriteItem of ≤25 puts). Created per partition via a
    * serializable factory so the connection lives executor-side.
    * Implementations must treat put as upsert per (pk, sk).
    */
  trait BatchWriter extends Serializable {
    /** Write one chunk; throw to signal a (possibly transient) failure. */
    def putBatch(items: Seq[KvItem]): Unit
    def close(): Unit = ()
  }

  /** DynamoDB's BatchWriteItem hard limit (dynamodb-ingestion.py:141). */
  val DynamoBatchLimit = 25

  /** Write a (pk, sk, value, record_type) frame through per-partition
    * chunked batch writers.
    *
    * @param newWriter serializable factory, invoked once per partition
    * @param maxRetries extra attempts per chunk before failing the task
    *                   (Spark then retries the whole task — safe because
    *                   puts are idempotent)
    */
  def write(df: DataFrame, newWriter: () => BatchWriter,
            batchSize: Int = DynamoBatchLimit, maxRetries: Int = 3,
            backoffMs: Long = 50L): Unit = {
    require(batchSize >= 1 && batchSize <= DynamoBatchLimit,
      s"batchSize must be in [1, $DynamoBatchLimit]: $batchSize")
    df.select("pk", "sk", "value", "record_type")
      .foreachPartition { rows: Iterator[Row] =>
        val w = newWriter()
        try {
          rows
            .map(r => KvItem(r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
            .grouped(batchSize)
            .foreach(chunk => putWithRetry(w, chunk, maxRetries, backoffMs))
        } finally w.close()
      }
  }

  private def putWithRetry(w: BatchWriter, chunk: Seq[KvItem],
                           maxRetries: Int, backoffMs: Long): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      try { w.putBatch(chunk); done = true }
      catch {
        case scala.util.control.NonFatal(e) if attempt < maxRetries =>
          attempt += 1
          if (backoffMs > 0) Thread.sleep(backoffMs << (attempt - 1))
      }
    }
  }
}

package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1: CSV scan coverage — declared-schema read with PERMISSIVE
  * coercion, exercised as a parquet→csv→parquet round-trip so the DuckDB
  * oracle (reading the original parquet) checks both the writer and the
  * reader.
  */
object SourceQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_csv_roundtrip" -> ((s, d) => {
      val tmp = s"/root/repo/target/csv_roundtrip_${math.abs(d.hashCode)}"
      val src = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      Csv.write(src, tmp)
      val schema = org.apache.spark.sql.types.StructType(src.schema.fields)
      Csv.readClean(s, tmp, schema)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          Tables.dsum(col("value")).as("total_value"))
        .orderBy(col("event_type"))
    }),

    // JSON-lines source: schema-declared read (never inference — that
    // costs a second pass over 100 TB).
    "s2_json_roundtrip" -> ((s, d) => {
      val tmp = s"/root/repo/target/json_roundtrip_${math.abs(d.hashCode)}"
      val src = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      src.write.mode("overwrite").json(tmp)
      s.read.schema(src.schema).json(tmp)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), Tables.dsum(col("value")).as("total_value"))
        .orderBy(col("event_type"))
    }),

    // ORC source: the second columnar format the engine reads/writes.
    "s4_orc_roundtrip" -> ((s, d) => {
      val tmp = s"/root/repo/target/orc_roundtrip_${math.abs(d.hashCode)}"
      val src = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"))
      src.write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), Tables.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // Avro source: the row-oriented interchange format (Kafka-ecosystem
    // payloads land as avro) — written and read back through Spark's
    // bundled avro data source (addressed by class name: the short
    // "avro" alias requires the separate spark-avro service
    // registration, but the format implementation ships in spark-sql);
    // the aggregate must equal the oracle's over the parquet original.
    "s5_avro_roundtrip" -> ((s, d) => {
      val avroFmt = "org.apache.spark.sql.avro.AvroFileFormat"
      val tmp = s"/root/repo/target/avro_roundtrip_${math.abs(d.hashCode)}"
      val src = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      src.write.mode("overwrite").format(avroFmt).save(tmp)
      s.read.format(avroFmt).load(tmp)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), Tables.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderstatus"))
    })
  )

  val oracles: Map[String, String] = Map(
    "s1_csv_roundtrip" ->
      """SELECT event_type, COUNT(*) AS n,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "s2_json_roundtrip" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "s4_orc_roundtrip" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "s5_avro_roundtrip" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin
  )
}

package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-enforced JSON event parsing with dead-letter routing — the batch
  * core shared by the streaming path (SURVEY §2.2 P1-P7, §2.9 T5;
  * reference: src/consumers/spark_streaming.py:90-141).
  *
  * Works on any frame with a string payload column (Kafka `value`, file
  * lines, testdata `props`). Parse failures are split — never dropped —
  * mirroring the reference's parse-or-dead-letter contract.
  */
object JsonIngest {

  final case class ParseResult(valid: DataFrame, deadLetter: DataFrame)

  /** P1/P2: cast payload to string and parse against the fixed schema.
    * Malformed payloads are detected via the corrupt-record column (Spark's
    * PERMISSIVE mode yields an all-null struct, not a null struct, so a
    * bare IS NULL test — the reference's approach — can't see them). */
  def parse(raw: DataFrame, payloadCol: String, schema: StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    raw.withColumn("raw_value", col(payloadCol).cast("string"))
      .withColumn("data", from_json(col("raw_value"), withCorrupt,
        Map("columnNameOfCorruptRecord" -> "_corrupt_record")))
  }

  /** P3-P7: split parsed rows into the valid flattened stream and the
    * dead-letter stream (enriched with error metadata). `clock` injectable
    * for deterministic tests. */
  def split(parsed: DataFrame, clock: Option[Column] = None): ParseResult = {
    val now = clock.getOrElse(current_timestamp())
    val isDead = col("data").isNull || col("data._corrupt_record").isNotNull
    val dead = parsed.filter(isDead)
      .select(col("raw_value"),
        now.as("error_time"),
        lit("json_parse_failure").as("error_type"))
    val valid = parsed.filter(!isDead)
      .select(col("data.*"), col("raw_value"))
      .drop("_corrupt_record")
      .withColumn("event_time", col("timestamp").cast("timestamp"))
      .withColumn("ingestion_time", now)
      .drop("timestamp", "raw_value")
    ParseResult(valid, dead)
  }

  def parseAndSplit(raw: DataFrame, payloadCol: String, schema: StructType,
                    clock: Option[Column] = None): ParseResult =
    split(parse(raw, payloadCol, schema), clock)
}

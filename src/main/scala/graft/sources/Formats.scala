package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch source/sink format surface: parquet (the engine's native layer
  * format), ORC (the columnar alternative), and JSON/CSV (interchange
  * formats at the edges — producer replay, dead-letter dumps, exports).
  *
  * Scale rules encoded here:
  *  - Columnar formats (parquet/ORC) carry min/max stats and dictionary
  *    pages: predicate pushdown and column pruning work. Row formats
  *    (JSON/CSV) always scan every byte of every selected file — keep them
  *    at the edges, convert to parquet on ingest.
  *  - Schema is ALWAYS explicit for row formats. Schema inference runs an
  *    extra full pass over the data before the real job (at 100 TB that is
  *    a second 100 TB scan) and can silently widen types between runs.
  *  - `partitionBy` layout gives partition pruning on any format; the
  *    partition column must match the dominant query predicate
  *    (sensor_type/event_type here, per the reference's layer layout).
  */
object Formats {

  val supported: Seq[String] = Seq("parquet", "orc", "json", "csv")

  def write(df: DataFrame, path: String, format: String,
            partitionBy: Seq[String] = Nil, mode: String = "overwrite"): Unit = {
    require(supported.contains(format), s"unsupported format $format")
    val w = df.write.mode(mode).format(format)
      .option("header", "true") // csv only; ignored elsewhere
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }

  /** Read with a mandatory schema for row formats; columnar formats use
    * their embedded schema (passing one anyway pins the contract). */
  def read(spark: SparkSession, path: String, format: String,
           schema: Option[StructType] = None): DataFrame = {
    require(supported.contains(format), s"unsupported format $format")
    val r = spark.read.format(format).option("header", "true")
    val withSchema = format match {
      case "json" | "csv" =>
        val s = schema.getOrElse(throw new IllegalArgumentException(
          s"$format reads require an explicit schema (inference = an extra full scan)"))
        r.schema(s)
      case _ => schema.fold(r)(r.schema)
    }
    withSchema.load(path)
  }
}

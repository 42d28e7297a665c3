package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout (SURVEY §2.11 scale extension; no reference
  * analog — the reference's warehouse relies on Redshift DISTKEY,
  * redshift_schema.sql, which this is the Spark-native equivalent of).
  *
  * Bucketing pre-shuffles a table ONCE at write time: rows are hashed on
  * the bucket key into a fixed number of files per partition. Every later
  * equi-join or aggregation on that key reads the layout instead of
  * re-shuffling — at 100 TB that turns the nightly fact⋈fact join from
  * two full-corpus exchanges into zero. The trade: the bucket count is
  * frozen at write time, so pick it for the TARGET cluster (one bucket
  * per ~128-256 MB of the largest consumer's partition budget), and both
  * join sides must agree on key AND bucket count (Spark joins tables with
  * differing bucket counts by shuffling the smaller one).
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sort-within-bucket) parquet
    * table in the session catalog. Sorted buckets additionally let
    * SortMergeJoin skip its per-partition sort when
    * `spark.sql.legacy.bucketedTableScan.outputOrdering` is honored. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Join two co-bucketed catalog tables on their shared bucket key.
    * With matching bucket counts the physical plan contains NO exchange —
    * asserted by BucketingSpec, the property this module exists for. */
  def colocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, key: String,
                    joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}

package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-native star-schema warehouse operators replacing the reference's
  * Redshift path (SURVEY §2.11 L1-L3, §2.3 J1-J3).
  *
  * Scale notes:
  *  - The idempotent load (L1) is a dynamic partition overwrite — only the
  *    partitions present in the incoming batch are replaced, never the
  *    whole table (the reference's DELETE-then-COPY window translates to
  *    replacing the affected time partitions).
  *  - Dimension upsert (J1/L2) is a full-outer join on the key; the dim
  *    side is small (DISTSTYLE ALL in the reference ≙ broadcast), so we
  *    broadcast the staging side when it fits and let AQE pick otherwise.
  *  - Fact↔dim joins (J3) broadcast the dims explicitly.
  */
object Warehouse {

  /** L3: hourly calendar dimension seed (redshift_schema.sql:48-68) —
    * `hours` consecutive hours from `startTs` with a dense 1-based
    * time_key. Generated distributed via spark.range (no driver loop). */
  def dimTime(spark: SparkSession, startTs: String, hours: Int): DataFrame = {
    val base = spark.range(hours.toLong).select(
      (col("id") + 1L).as("time_key"),
      expr(s"timestampadd(HOUR, id, timestamp'$startTs')").as("full_timestamp"))
    base.select(
      col("time_key"),
      col("full_timestamp"),
      hour(col("full_timestamp")).as("hour"),
      dayofmonth(col("full_timestamp")).as("day"),
      month(col("full_timestamp")).as("month"),
      year(col("full_timestamp")).as("year"),
      dayofweek(col("full_timestamp")).as("day_of_week"),
      dayofweek(col("full_timestamp")).isin(1, 7).as("is_weekend"))
  }

  /** J1/L2: idempotent dimension upsert via full-outer join — matched keys
    * take the staging row's `updateCols` (with `greatest` merge for
    * `maxMergeCols`), unmatched keep the dim row, new keys insert.
    * Equivalent to the reference's staging+MERGE (redshift_loader.py:136-189)
    * and to Delta `MERGE INTO`. */
  def upsertDim(dim: DataFrame, staging: DataFrame, key: String,
                stagingWins: Seq[String], dimWins: Seq[String],
                maxMergeCols: Seq[String]): DataFrame = {
    val d = dim.as("d")
    val s = staging.as("s")
    val merged = d.join(s, col(s"d.$key") === col(s"s.$key"), "full_outer")
    val outCols: Seq[Column] =
      coalesce(col(s"s.$key"), col(s"d.$key")).as(key) +:
        (stagingWins.map(c => coalesce(col(s"s.$c"), col(s"d.$c")).as(c)) ++
          dimWins.map(c => coalesce(col(s"d.$c"), col(s"s.$c")).as(c)) ++
          maxMergeCols.map(c =>
            when(col(s"s.$c").isNull, col(s"d.$c"))
              .when(col(s"d.$c").isNull, col(s"s.$c"))
              .otherwise(greatest(col(s"d.$c"), col(s"s.$c"))).as(c)))
    merged.select(outCols: _*)
  }

  /** SCD Type-2 history from a change stream: one row per (key,
    * consecutive run of an identical tracked attribute), with
    * `valid_from` = first event time of the run, `valid_to` = start of the
    * next run (null while current), a dense 1-based `version`, and the run's
    * event count. The L2 upsert keeps only latest state (SCD1); this keeps
    * full attribute history — the warehouse pattern for auditable dims.
    *
    * Gaps-and-islands shape (same cost profile as dedup/sessionize): one
    * shuffle on the key, two window passes, one hash aggregation.
    * `orderCols` must be a total order per key for deterministic versions. */
  def scd2History(df: DataFrame, key: String, attrCol: String, timeCol: String,
                  orderCols: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    val prev = lag(col(attrCol), 1).over(w)
    val changed = when(prev.isNull || prev =!= col(attrCol), 1).otherwise(0)
    val versioned = df.withColumn("_chg", changed)
      .withColumn("version",
        sum(col("_chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val hist = versioned.groupBy(col(key), col("version"), col(attrCol))
      .agg(min(col(timeCol)).as("valid_from"), count(lit(1)).as("n_events"))
    val wv = Window.partitionBy(key).orderBy(col("version").asc)
    hist.withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
  }

  /** Small-files compaction: rewrite a parquet table (or a subset of its
    * partitions) into ~`targetRowsPerFile`-row files. Streaming ingest
    * appends one file set per trigger, so a 30-second-trigger bronze layer
    * grows ~2,880 file groups/day/partition — at 100 TB the resulting
    * metadata and open-file overhead dominates scan time long before data
    * volume does. Compaction is the maintenance pass that restores scan
    * efficiency; with `partitionBy` set, rewritten partitions replace
    * in-place (dynamic overwrite) and untouched partitions survive.
    *
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String, targetRowsPerFile: Long,
              partitionBy: Seq[String] = Nil): (Long, Long) = {
    // all table-path IO goes through the Hadoop FileSystem API so the
    // stage-then-swap works on whatever filesystem actually holds the
    // table (HDFS, S3A, file://) — java.io.File would walk/rename the
    // DRIVER's local disk on a real cluster
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    def countFiles(): Long = {
      val it = fs.listFiles(live, true)
      var n = 0L
      while (it.hasNext) {
        if (it.next().getPath.getName.endsWith(".parquet")) n += 1L
      }
      n
    }
    val before = countFiles()
    val df = spark.read.parquet(path)
    val rows = df.count()
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetRowsPerFile).toInt)
    val writer = df.repartition(nFiles).write.mode(SaveMode.Overwrite)
    val tmp = new org.apache.hadoop.fs.Path(path + "_compacting")
    // write to a sibling, then swap — a failed compaction never corrupts
    // the live table (object stores: write to a new prefix + atomic
    // manifest/metastore repoint instead)
    val w = if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer
    w.parquet(tmp.toString)
    val backup = new org.apache.hadoop.fs.Path(path + "_precompact")
    require(fs.rename(live, backup), s"could not stage $path aside")
    require(fs.rename(tmp, live), s"could not promote $tmp")
    fs.delete(backup, true)
    (before, countFiles())
  }

  /** L1: idempotent fact load — replace exactly the partitions carried by
    * the batch (dynamic partition overwrite), the Spark-native analogue of
    * the reference's transactional DELETE [start,end) + COPY
    * (redshift_loader.py:84-133). */
  def idempotentPartitionLoad(df: DataFrame, path: String,
                              partitionCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** L1 (JDBC variant): the reference's transactional DELETE-window + COPY
    * against a real warehouse endpoint (redshift_loader.py:58-133), for
    * users with a JDBC warehouse instead of a parquet lake: one driver-side
    * DELETE of the affected time window, then a distributed
    * `df.write.jdbc` append of the batch's rows in that window. Re-running
    * the same batch is idempotent (the delete clears the previous attempt).
    *
    * Scale notes: the DELETE is a single statement executed BY the
    * warehouse (no data moves through Spark); the append fans out over
    * `numPartitions` executor connections (`numPartitions` caps concurrent
    * warehouse sessions — size it to what the endpoint tolerates, not to
    * cluster cores). Spark's JDBC writes can't share one warehouse
    * transaction across executors, so the window is briefly empty during
    * reload; a failure mid-append is repaired by re-running (same
    * delete-window contract as the reference's retry loop,
    * redshift_loader.py:120-133). */
  def idempotentJdbcLoad(df: DataFrame, url: String, table: String,
                         windowCol: String,
                         windowStart: java.sql.Timestamp,
                         windowEnd: java.sql.Timestamp,
                         numPartitions: Int = 8): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val meta = conn.getMetaData
      val exists = {
        val rs = meta.getTables(null, null, table.toUpperCase, null)
        try rs.next() finally rs.close()
      }
      if (exists) {
        // Spark's JDBC writer creates the table with QUOTED (case-exact)
        // column identifiers — quote the predicate column the same way or
        // the unquoted name case-folds and fails to resolve.
        val st = conn.prepareStatement(
          s"""DELETE FROM $table WHERE "$windowCol" >= ? AND "$windowCol" < ?""")
        try {
          st.setTimestamp(1, windowStart)
          st.setTimestamp(2, windowEnd)
          st.executeUpdate()
        } finally st.close()
      }
    } finally conn.close()
    df.filter(col(windowCol) >= lit(windowStart) && col(windowCol) < lit(windowEnd))
      .write
      .mode(SaveMode.Append)
      .option("numPartitions", numPartitions.toString)
      .jdbc(url, table, new java.util.Properties)
  }

  /** Read-back side of the JDBC warehouse path (dashboard scans against
    * the warehouse endpoint). Predicate pushdown applies: Spark ships the
    * WHERE clause to the warehouse. */
  def readJdbc(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.jdbc(url, table, new java.util.Properties)

  /** J3: star join — fact joined to (small) dimensions with explicit
    * broadcast, the Spark analogue of DISTSTYLE ALL dims
    * (redshift_schema.sql:32,45). */
  def starJoin(fact: DataFrame, dims: Seq[(DataFrame, Seq[String])]): DataFrame =
    dims.foldLeft(fact) { case (f, (dim, keys)) =>
      f.join(broadcast(dim), keys, "left")
    }

  /** Co-located join via bucketing: write both sides bucketed+sorted on
    * the join key (`saveAsTable` — bucketing metadata lives in the
    * catalog) so repeated fact↔fact joins on that key run with NO shuffle
    * on either side. This is the KEYED-layout strategy for 100 TB fact
    * tables: pay the partitioning once at write time, amortize it over
    * every downstream join/aggregation on the same key. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, path: Option[String] = None): Unit = {
    // Overwrite only replaces tables the catalog knows about; drop first so
    // a re-run against a fresh (in-memory) catalog doesn't trip over the
    // previous run's managed location. For cross-session idempotence pass
    // an explicit `path` (external table): Spark refuses to re-create a
    // MANAGED table over a stale location by design.
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))

  /** Row-level reconciliation between a current table and a snapshot:
    * one row per differing key with change_type 'added' (key only in
    * current), 'removed' (only in snapshot), or 'changed' (both sides,
    * any compared column differs — null-safe, so null→value and
    * value→null both count). Identical rows are dropped. The backfill /
    * CDC validation primitive: "what exactly did this load change?"
    *
    * Cost: ONE shuffle of |current|+|snapshot| on the key (full-outer
    * equi-join); the column comparison is a codegen'd null-safe
    * predicate, no row serialization or hashing. Output is
    * change-set-sized — at 100 TB a healthy diff is tiny, and a
    * pathological one is still bounded by the inputs. */
  def tableDiff(current: DataFrame, snapshot: DataFrame, key: String,
                compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    val c = current.as("c")
    val s = snapshot.as("s")
    val joined = c.join(s, col(s"c.$key") === col(s"s.$key"), "full_outer")
    val anyDiff = compareCols
      .map(cc => !(col(s"c.$cc") <=> col(s"s.$cc")))
      .reduce(_ || _)
    joined.select(
        coalesce(col(s"c.$key"), col(s"s.$key")).as(key),
        when(col(s"s.$key").isNull, "added")
          .when(col(s"c.$key").isNull, "removed")
          .when(anyDiff, "changed")
          .as("change_type"))
      .filter(col("change_type").isNotNull)
  }
}

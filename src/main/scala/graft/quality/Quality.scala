package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spark-native data-quality checks replacing the reference's pandas layer
  * (SURVEY §2.12 Q1-Q10; reference: src/quality/expectations.py and the
  * great_expectations suites).
  *
  * Every check is expressed as a conditional-count aggregate so an entire
  * suite over one table collapses into ONE scan + ONE single-row aggregate
  * (the reference's pandas layer loads the whole table into driver memory —
  * a non-starter at 100 TB). Cross-table checks (row-ratio) add one count
  * per extra table.
  */
object Quality {

  final case class CheckResult(check: String, failed: Long, observed: Double)

  /** A named conditional-count: `failedExpr` counts offending rows. */
  final case class Check(name: String, failedExpr: Column)

  def notEmpty(df: DataFrame): Check =
    Check("not_empty", lit(0L)) // handled via total count; see run()

  def notNull(cols: Seq[String]): Seq[Check] =
    cols.map(c => Check(s"not_null_$c", sum(when(col(c).isNull, 1L).otherwise(0L))))

  def inSet(colName: String, allowed: Seq[String]): Check =
    Check(s"domain_$colName",
      sum(when(!col(colName).isin(allowed: _*) || col(colName).isNull, 1L).otherwise(0L)))

  /** Per-type physical range check (Q4): value outside the wide bounds for
    * its type counts as a failure; unknown types are not range-checked. */
  def perTypeRange(typeCol: String, valueCol: String,
                   ranges: Map[String, (Double, Double)]): Check = {
    val bad = ranges.toSeq.sortBy(_._1).foldLeft(lit(false)) {
      case (acc, (t, (lo, hi))) =>
        acc || (col(typeCol) === lit(t) && (col(valueCol) < lo || col(valueCol) > hi))
    }
    Check("physical_range", sum(when(bad, 1L).otherwise(0L)))
  }

  /** Null-rate <= maxRate for every listed column (Q5). Returns one check
    * per column; `failed` is 1 when the column's null fraction exceeds the
    * budget. */
  def nullRate(cols: Seq[String], maxRate: Double): Seq[Check] =
    cols.map { c =>
      Check(s"null_rate_$c",
        when(avg(col(c).isNull.cast("int")) > maxRate, 1L).otherwise(0L))
    }

  def regexMatch(colName: String, pattern: String): Check =
    Check(s"regex_$colName",
      sum(when(!col(colName).rlike(pattern) || col(colName).isNull, 1L).otherwise(0L)))

  /** Uniqueness of a key tuple (Q6): number of extra rows beyond one per
    * key = total - distinct keys. */
  def uniqueKey(df: DataFrame, keys: Seq[String]): Long = {
    val agg = df.agg(count(lit(1)).as("n"),
      countDistinct(keys.head, keys.tail: _*).as("d")).head()
    agg.getLong(0) - agg.getLong(1)
  }

  /** The whole suite as ONE single-row aggregate DataFrame (one scan, one
    * job): a `_total` row count plus one failure-count column per check. */
  def suiteDf(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val aggs = count(lit(1)).as("_total") +:
      checks.map(c => coalesce(c.failedExpr, lit(0L)).as(c.name))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Run a suite of single-pass checks over one table. One job: a single
    * aggregate producing every check's failure count plus the total row
    * count (Q1). */
  def run(df: DataFrame, checks: Seq[Check]): Seq[CheckResult] = {
    val row = suiteDf(df, checks).head()
    val total = row.getLong(0)
    CheckResult("not_empty", if (total == 0) 1L else 0L, total.toDouble) +:
      checks.zipWithIndex.map { case (c, i) =>
        CheckResult(c.name, row.getLong(i + 1), row.getLong(i + 1).toDouble)
      }
  }

  /** Q8: downstream/upstream row-count ratio must stay within
    * [lo, hi] (expectations.py:158-165). */
  def rowRatio(upstream: DataFrame, downstream: DataFrame,
               lo: Double, hi: Double): CheckResult = {
    val up = upstream.count()
    val down = downstream.count()
    val ratio = if (up == 0) 0.0 else down.toDouble / up
    CheckResult("row_ratio", if (ratio < lo || ratio > hi) 1L else 0L, ratio)
  }

  /** Data freshness: per-group newest event time and its lag behind
    * `asOf`, with a staleness flag at `maxLagSeconds` — the engine-side
    * form of the reference's Bronze-staleness probe
    * (dags/streaming_pipeline_dag.py:88-126 checks S3 last-modified age
    * and fails the DAG above 30 minutes). `asOf` is an explicit
    * parameter, not now(): a freshness check must itself be reproducible
    * (and testable) — the caller passes the evaluation instant. One
    * aggregation; never scans more than the pruned `tsCol` column. */
  def freshness(df: DataFrame, tsCol: String, groupCols: Seq[String],
                asOf: java.sql.Timestamp,
                maxLagSeconds: Long): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(max(col(tsCol)).as("latest"))
      .withColumn("lag_seconds",
        unix_timestamp(lit(asOf)) - unix_timestamp(col("latest")))
      .withColumn("stale", col("lag_seconds") > maxLagSeconds)

  /** Q10: fail-fast contract — abort the pipeline on any failed check so an
    * orchestrator marks the stage red (expectations.py:205-207). */
  def enforce(results: Seq[CheckResult]): Unit = {
    val failed = results.filter(_.failed > 0)
    if (failed.nonEmpty)
      throw new IllegalStateException(
        "data-quality checks failed: " +
          failed.map(r => s"${r.check}(failed=${r.failed})").mkString(", "))
  }

  /** Order-independent content fingerprint of a projection: one row of
    * (row_count, bit_xor of a 60-bit md5-derived row hash). Lets a re-run,
    * an engine port, or a replica be compared with ONE row instead of a
    * table diff; XOR commutes, so the result is independent of partitioning
    * and row order, and any single-row change flips it. md5 keeps the hash
    * engine-portable (the oracle recomputes it in SQL).
    *
    * Each column is hashed INDIVIDUALLY before the rows combine: the
    * per-column md5 is fixed-width hex, so a delimiter character inside a
    * value can't shift content across column boundaries, and NULL gets an
    * explicit sentinel instead of `concat_ws`'s silent skip (which would
    * hash ("a", NULL, "x") and ("a", "x", NULL) identically).
    *
    * Caveat, by construction: rows duplicated an EVEN number of times
    * cancel out of the XOR — pair with `row_count` (which does catch
    * them) or [[uniqueKey]] when exact multiset equality matters.
    *
    * Scale shape: narrow projection → one hash aggregation; only 8-byte
    * hashes cross the wire. */
  def contentFingerprint(df: DataFrame, cols: Seq[String]): DataFrame = {
    val colHashes = cols.map(c =>
      md5(coalesce(col(c).cast("string"), lit("<NULL>")).cast("binary")))
    val rowHash = conv(substring(
        md5(concat_ws("|", colHashes: _*).cast("binary")), 1, 15), 16, 10)
      .cast("long")
    df.select(rowHash.as("h"))
      .agg(count(lit(1)).as("row_count"),
        expr("bit_xor(h)").as("content_hash"))
  }

  /** Schema drift between an expected and an observed frame: one row per
    * column name with status `added` (observed only), `dropped`
    * (expected only), `type_changed`, or `ok`, plus both type strings.
    * Pure metadata — no job runs. The upstream-contract tripwire to run
    * before a late-merge (`Silver.lateMerge`) or warehouse load accepts
    * a new day's files. */
  def schemaDiff(expected: DataFrame, observed: DataFrame): Seq[(String, String, String, String)] = {
    val e = expected.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val o = observed.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val names = (expected.schema.map(_.name) ++
      observed.schema.map(_.name).filterNot(e.contains)).distinct
    names.map { n =>
      (e.get(n), o.get(n)) match {
        case (Some(t), None)              => (n, "dropped", t, "")
        case (None, Some(t))              => (n, "added", "", t)
        case (Some(a), Some(b)) if a != b => (n, "type_changed", a, b)
        case (Some(a), Some(_))           => (n, "ok", a, a)
        case (None, None)                 => (n, "ok", "", "") // unreachable
      }
    }
  }

  /** [[schemaDiff]] reduced to the breaking subset (anything but `ok`
    * and `added` — additions are tolerated by unionByName-style late
    * merges, drops and type changes are not). */
  def breakingSchemaChanges(expected: DataFrame,
                            observed: DataFrame): Seq[(String, String, String, String)] =
    schemaDiff(expected, observed)
      .filterNot(d => d._2 == "ok" || d._2 == "added")

  /** Per-column table profile in ONE aggregation job: for every listed
    * column — (column, n_rows, n_nulls, n_distinct, min_num, max_num,
    * min_str, max_str), numeric bounds for `numericCols` (null for
    * strings) and vice versa. The first-look / drift-baseline primitive
    * of a profiling layer.
    *
    * Cost: one scan + one aggregation; the multi-column exact
    * countDistinct plans as ONE shuffle with an Expand (rows ×
    * #distinct-aggs) — fine for profile-sized column lists. For very
    * wide tables or when exactness is not needed, swap countDistinct
    * for approx_count_distinct (one pass, no Expand); the sketch
    * family (HLL) covers the mergeable/incremental variant. The
    * single wide aggregate row (a few values per column) then pivots
    * to long form driver-side — profile output is column-count-sized
    * by construction. */
  def profile(df: DataFrame, numericCols: Seq[String],
              stringCols: Seq[String]): DataFrame = {
    require((numericCols ++ stringCols).nonEmpty, "no columns to profile")
    require(numericCols.intersect(stringCols).isEmpty,
      "a column cannot be both numeric and string")
    val aggs: Seq[Column] =
      count(lit(1)).as("__n") +:
        ((numericCols ++ stringCols).map(c => count(col(c)).as(s"${c}__c")) ++
          (numericCols ++ stringCols).map(c =>
            countDistinct(col(c)).as(s"${c}__d")) ++
          numericCols.flatMap(c => Seq(
            min(col(c)).cast("double").as(s"${c}__mn"),
            max(col(c)).cast("double").as(s"${c}__mx"))) ++
          stringCols.flatMap(c => Seq(
            min(col(c)).as(s"${c}__smn"), max(col(c)).as(s"${c}__smx"))))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = (numericCols.map(_ -> true) ++ stringCols.map(_ -> false))
      .map { case (c, isNum) =>
        struct(lit(c).as("column"), col("__n").as("n_rows"),
          (col("__n") - col(s"${c}__c")).as("n_nulls"),
          col(s"${c}__d").as("n_distinct"),
          (if (isNum) col(s"${c}__mn") else lit(null).cast("double")).as("min_num"),
          (if (isNum) col(s"${c}__mx") else lit(null).cast("double")).as("max_num"),
          (if (isNum) lit(null).cast("string") else col(s"${c}__smn")).as("min_str"),
          (if (isNum) lit(null).cast("string") else col(s"${c}__smx")).as("max_str"))
      }
    wide.select(explode(array(entries: _*)).as("p")).select("p.*")
  }
}

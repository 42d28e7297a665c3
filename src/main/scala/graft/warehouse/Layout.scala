package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout (Z-order clustering).
  *
  * Partition pruning handles ONE dimension (the partition column); any
  * second predicate column scans every file. Z-ordering interleaves the
  * bits of two dimensions into one sort key so that a range predicate on
  * EITHER dimension touches a small fraction of files — parquet row-group
  * min/max stats then skip the rest at the scan, before any IO. This is
  * the standard lakehouse technique for multi-predicate fact tables
  * (e.g. events filtered by user range AND value band at 100 TB).
  *
  * The z-value is pure Column arithmetic (shift/mask/or), so it stays
  * inside whole-stage codegen, and the write path is one range
  * repartition + in-partition sort — exactly the shuffle a plain
  * `ORDER BY` write would cost, with far better skipping for 2-D
  * predicates.
  */
object Layout {

  /** Interleave the low `bits` bits of two non-negative integral columns:
    * bit i of `x` lands at position 2i+1, bit i of `y` at 2i. Values are
    * masked to `bits` bits first, so out-of-range inputs degrade to
    * coarser clustering rather than wrong ordering. */
  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(lit(mask))
    val ym = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i))
    }
  }

  /** N-column interleave: bit i of column j lands at position i·k + (k−1−j)
    * for k columns — column 0 gets the most significant bit of each round,
    * matching [[zValue2]] exactly when k = 2. `bits · k` must fit a long's
    * 63 usable bits. */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 2, s"need at least 2 columns, got $k")
    require(bits >= 1 && bits * k <= 63,
      s"bits*cols must fit a long: bits=$bits cols=$k")
    val mask = (1L << bits) - 1
    val masked = cols.map(_.cast("long").bitwiseAND(lit(mask)))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      masked.zipWithIndex.foldLeft(acc) { case (a, (c, j)) =>
        a.bitwiseOR(
          shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + (k - 1 - j)))
      }
    }
  }

  /** The same interleave as ANSI SQL text (DuckDB-compatible), so oracles
    * can verify the z-curve bit-for-bit. */
  def zValue2Sql(x: String, y: String, bits: Int): String =
    zValueNSql(Seq(x, y), bits)

  /** N-column SQL mirror of [[zValueN]] — generated from the same bit
    * layout so both engines compute the identical curve. */
  def zValueNSql(cols: Seq[String], bits: Int): String = {
    val k = cols.size
    require(k >= 2, s"need at least 2 columns, got $k")
    require(bits >= 1 && bits * k <= 63,
      s"bits*cols must fit a long: bits=$bits cols=$k")
    val mask = (1L << bits) - 1
    val terms = (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        s"((((${c} & $mask) >> $i) & 1) << ${i * k + (k - 1 - j)})"
      }
    }
    terms.mkString("(", " | ", ")")
  }

  /** Write `df` z-clustered on (x, y): range-partition into `numFiles`
    * z-ranges (one shuffle, driver-side range sampling only), sort each
    * partition by z, drop the helper column at the writer. Files end up
    * with non-overlapping z-ranges → row-group stats skip aggressively
    * for range predicates on either input dimension. */
  def zorderWrite(df: DataFrame, x: Column, y: Column, bits: Int,
                  numFiles: Int, path: String): Unit = {
    df.withColumn("_z", zValue2(x, y, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}

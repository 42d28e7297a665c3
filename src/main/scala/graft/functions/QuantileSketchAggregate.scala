package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, QuantileSummaries}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Mutable build/merge buffer around a Greenwald–Khanna summary. The
  * summary auto-compresses its insertion head as it fills; [[compacted]]
  * flushes any remaining head before serialize/merge/query (the GK merge
  * contract requires compressed operands). */
final class QuantileSketchBuffer(var qs: QuantileSummaries) {
  def add(v: Double): Unit = { qs = qs.insert(v) }
  def compacted: QuantileSummaries = {
    if (!qs.compressed) qs = qs.compress()
    qs
  }
}

/** Shared wire format for the serialized sketch:
  * [double relativeError][long count][int n][(double value, long g,
  * long delta) × n]. Fixed-width, engine-owned — the stored-state
  * contract must not depend on Java serialization of a Spark-internal
  * class surviving version upgrades. */
object QuantileSketchCodec {
  def write(qs: QuantileSummaries): Array[Byte] = {
    val s = qs.sampled
    val bb = ByteBuffer.allocate(8 + 8 + 4 + 24 * s.length)
    bb.putDouble(qs.relativeError)
    bb.putLong(qs.count)
    bb.putInt(s.length)
    s.foreach { st => bb.putDouble(st.value); bb.putLong(st.g); bb.putLong(st.delta) }
    bb.array()
  }

  def read(bytes: Array[Byte]): QuantileSummaries = {
    val bb = ByteBuffer.wrap(bytes)
    val relErr = bb.getDouble
    val count = bb.getLong
    val n = bb.getInt
    val stats = Array.tabulate(n) { _ =>
      new QuantileSummaries.Stats(bb.getDouble, bb.getLong, bb.getLong)
    }
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      relErr, stats, count, true)
  }
}

/** Build a mergeable quantile sketch (Greenwald–Khanna summary — the
  * exact structure behind the built-in `percentile_approx`) from raw
  * values, emitted as a binary register blob. Completes the engine's
  * mergeable-sketch triad — HLL (distinct), CMS (frequency), GK
  * (distribution): Spark can BUILD a percentile estimate per query, but
  * ships no way to STORE the summary and fold later data into it
  * ([[QuantileSketchMergeAgg]] is that fold, the quantile counterpart of
  * `hll_union_agg` / [[CmsMerge]]).
  *
  * Guarantee: a φ-quantile query on the sketch returns an input value
  * whose rank is within ±relativeError·n of φ·n. State is
  * O(1/relativeError · log(ε·n)) (value, g, delta) triples — KBs per
  * group at any corpus size, which is why this is the standard "what
  * does the value distribution look like" state at 100 TB: sketch per
  * partition/day once, answer any range's quantiles by merging blobs
  * instead of rescanning events. NULLs are skipped; an empty group
  * yields NULL. */
case class QuantileSketchAgg(child: Expression, relativeError: Double,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketchBuffer]
  with UnaryLike[Expression] {

  require(relativeError > 0 && relativeError < 1,
    "relativeError must be in (0, 1)")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): QuantileSketchBuffer =
    new QuantileSketchBuffer(new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, relativeError,
      Array.empty, 0L, false))

  override def update(buf: QuantileSketchBuffer, input: InternalRow): QuantileSketchBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: QuantileSketchBuffer, b: QuantileSketchBuffer): QuantileSketchBuffer = {
    if (b.qs.count > 0) {
      if (a.qs.count == 0) a.qs = b.compacted
      else a.qs = a.compacted.merge(b.compacted)
    }
    a
  }

  // compact BEFORE the emptiness test: `count` only reflects inserts once
  // the GK head buffer flushes, and Complete-mode / window evaluation
  // calls eval() straight after update() with no serialize() in between —
  // testing the un-flushed count would discard sub-head-size groups
  override def eval(buf: QuantileSketchBuffer): Any = {
    val qs = buf.compacted
    if (qs.count == 0) null else QuantileSketchCodec.write(qs)
  }

  override def serialize(buf: QuantileSketchBuffer): Array[Byte] =
    QuantileSketchCodec.write(buf.compacted)

  override def deserialize(bytes: Array[Byte]): QuantileSketchBuffer =
    new QuantileSketchBuffer(QuantileSketchCodec.read(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_quantile_sketch"
}

/** Binary-counter fold buffer for [[QuantileSketchMergeAgg]]: slot i
  * holds one summary built from ~2^i merged operands; inserting a new
  * operand "carries" up through occupied slots like incrementing a
  * binary counter. Any single operand therefore participates in at most
  * log₂(N) merges — the GK merge's rank-error widening compounds with
  * fold DEPTH, so the binary-counter fold keeps an N-way union at
  * ~(1 + log₂N·δ)·ε instead of the linear left-fold's ~N·δ·ε drift
  * (measured: a ~30-way linear day fold read ~3.2ε, the tree fold reads
  * ~2ε — see x_quantile_sketch). Memory is log₂(N) summaries, still
  * aggregate-sized. */
final class QuantileMergeBuffer {
  val levels = scala.collection.mutable.ArrayBuffer.empty[QuantileSummaries]

  private def insertAt(qs0: QuantileSummaries, lvl0: Int): Unit = {
    var qs = qs0
    var lvl = lvl0
    while (lvl < levels.length && (levels(lvl) ne null)) {
      qs = levels(lvl).merge(qs)
      levels(lvl) = null
      lvl += 1
    }
    while (levels.length <= lvl) levels += null
    levels(lvl) = qs
  }

  def add(qs: QuantileSummaries): Unit = insertAt(qs, 0)

  /** Fold another buffer in, slot-by-slot at its own levels, so depth
    * stays logarithmic across partial-aggregate merges too. */
  def absorb(other: QuantileMergeBuffer): Unit = {
    var i = 0
    while (i < other.levels.length) {
      if (other.levels(i) ne null) insertAt(other.levels(i), i)
      i += 1
    }
  }

  /** Collapse the ≤ log₂(N) remaining slots into one summary.
    * Non-destructive: window evaluation may call eval() repeatedly on a
    * still-updating buffer. */
  def result: Option[QuantileSummaries] = {
    val occupied = levels.filter(_ ne null)
    if (occupied.isEmpty) None
    else Some(occupied.reduceLeft((a, b) => a.merge(b)))
  }
}

/** Union-merge of serialized [[QuantileSketchAgg]] blobs — what lets a
  * streaming job keep ONE mergeable distribution state per group: each
  * micro-batch builds its partial with [[QuantileSketchAgg]] and this
  * operator folds it into the stored blob. GK merge adds the operands'
  * counts and interleaves their samples; the merged summary answers
  * queries over the concatenated input within the summed error bound
  * (ε_a + ε_b worst-case — keep every producer at one relativeError).
  * Operands fold through a BALANCED binary-counter tree
  * ([[QuantileMergeBuffer]]) rather than a left fold, bounding merge
  * depth — and hence the practical error drift — at log₂(#operands):
  * a 30-way day fold stays ~2ε where the linear fold measured ~3.2ε.
  * NULL inputs are skipped; an empty group yields NULL. */
case class QuantileSketchMergeAgg(child: Expression,
                                  mutableAggBufferOffset: Int = 0,
                                  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileMergeBuffer]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): QuantileMergeBuffer =
    new QuantileMergeBuffer

  override def update(buf: QuantileMergeBuffer, input: InternalRow): QuantileMergeBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val other = QuantileSketchCodec.read(v.asInstanceOf[Array[Byte]])
      if (other.count > 0) buf.add(other)
    }
    buf
  }

  override def merge(a: QuantileMergeBuffer, b: QuantileMergeBuffer): QuantileMergeBuffer = {
    a.absorb(b)
    a
  }

  override def eval(buf: QuantileMergeBuffer): Any =
    buf.result match {
      case Some(qs) if qs.count > 0 => QuantileSketchCodec.write(qs)
      case _ => null
    }

  // intermediate wire format (shuffle-internal, never stored): the
  // sparse level list — [int n][(int level, int len, blob) × n] — so a
  // partial's operands keep their levels on the reduce side
  override def serialize(buf: QuantileMergeBuffer): Array[Byte] = {
    val present = buf.levels.zipWithIndex.filter(_._1 ne null)
    val blobs = present.map { case (qs, i) => (i, QuantileSketchCodec.write(qs)) }
    val bb = ByteBuffer.allocate(4 + blobs.map(8 + _._2.length).sum)
    bb.putInt(blobs.length)
    blobs.foreach { case (i, b) => bb.putInt(i); bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): QuantileMergeBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new QuantileMergeBuffer
    (0 until n).foreach { _ =>
      val lvl = bb.getInt
      val len = bb.getInt
      val blob = new Array[Byte](len)
      bb.get(blob)
      while (buf.levels.length <= lvl) buf.levels += null
      // direct slot placement (no carry): levels in a serialized partial
      // are already distinct; a collision with an existing occupant can
      // only happen via absorb(), which carries
      if (buf.levels(lvl) eq null) buf.levels(lvl) = QuantileSketchCodec.read(blob)
      else buf.absorb({ val t = new QuantileMergeBuffer
        while (t.levels.length <= lvl) t.levels += null
        t.levels(lvl) = QuantileSketchCodec.read(blob); t })
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchMergeAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_quantile_merge"
}

/** Scalar read of a serialized sketch: the φ-quantile estimates for a
  * fixed percentage list, as array<double> (null on a NULL/empty
  * sketch). Eval-only (CodegenFallback) — it runs once per GROUP row on
  * the read side, never in a per-event hot path, so codegen would buy
  * nothing. */
case class QuantileSketchQuery(child: Expression, percentages: Seq[Double])
  extends Expression with UnaryLike[Expression] with CodegenFallback {

  require(percentages.nonEmpty && percentages.forall(p => p >= 0 && p <= 1),
    "percentages must be in [0, 1]")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def foldable: Boolean = child.foldable

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val qs = QuantileSketchCodec.read(v.asInstanceOf[Array[Byte]])
      if (qs.count == 0) null
      else new GenericArrayData(
        percentages.map(p => qs.query(p).get: Any).toArray)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): QuantileSketchQuery =
    copy(child = newChild)
  override def prettyName: String = "graft_quantile_query"
}

/** The sketch's SELF-REPORTED rank-error guarantee: max(g+delta)/2 over
  * its samples — the exact `targetError` the GK query path promises to
  * stay within. Doubles as the operational "how accurate is this stored
  * state" probe: a freshly built sketch reports ≤ ε·n, and every
  * union-merge widens the bound, so monitoring this value tells a
  * pipeline when a long-lived blob should be rebuilt from source.
  * NULL on a NULL/empty sketch. */
case class QuantileSketchBound(child: Expression)
  extends Expression with UnaryLike[Expression] with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def foldable: Boolean = child.foldable

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val qs = QuantileSketchCodec.read(v.asInstanceOf[Array[Byte]])
      if (qs.count == 0) null
      else if (qs.sampled.isEmpty) 0.0
      else qs.sampled.map(s => s.g + s.delta).max / 2.0
    }
  }

  override protected def withNewChildInternal(newChild: Expression): QuantileSketchBound =
    copy(child = newChild)
  override def prettyName: String = "graft_quantile_bound"
}

object QuantileFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Aggregate Column: mergeable GK quantile sketch of `c` (cast to
    * double) at the given relative rank error. */
  def quantileSketch(c: Column, relativeError: Double): Column =
    column(QuantileSketchAgg(expression(c.cast("double")), relativeError)
      .toAggregateExpression())

  /** Aggregate Column: union-merge of serialized quantile sketches. */
  def quantileSketchMerge(c: Column): Column =
    column(QuantileSketchMergeAgg(expression(c)).toAggregateExpression())

  /** Scalar Column: φ-quantile estimates read from a sketch blob. */
  def quantileSketchQuery(c: Column, percentages: Seq[Double]): Column =
    column(QuantileSketchQuery(expression(c), percentages))

  /** Scalar Column: the sketch's self-reported rank-error bound. */
  def quantileSketchBound(c: Column): Column =
    column(QuantileSketchBound(expression(c)))
}

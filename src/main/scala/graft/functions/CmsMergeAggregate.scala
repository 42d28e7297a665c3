package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.util.sketch.CountMinSketch

/** Mutable union-merge buffer: null until the first sketch arrives. */
final class CmsMergeBuffer(var sk: CountMinSketch)

/** Union-merge of serialized count-min sketches — the frequency
  * counterpart of the built-in `hll_union_agg`, which Spark provides for
  * HLL but not for CMS (`count_min_sketch` can BUILD a sketch from raw
  * rows, but nothing in SQL merges two already-built sketch binaries).
  * This is what lets a streaming job keep ONE mergeable frequency state
  * per group: each micro-batch builds its partial with the built-in
  * aggregate, and this operator folds it into the stored register blob —
  * registers add cell-wise, so the merged sketch is byte-for-byte the
  * sketch of the concatenated input.
  *
  * All inputs must share (depth, width, seed) — guaranteed when every
  * producer calls `count_min_sketch` with the same (eps, confidence,
  * seed) — otherwise the underlying `mergeInPlace` throws an
  * IncompatibleMergeException, which is the correct loud failure for a
  * mixed-parameter state table. NULL inputs are skipped; an empty group
  * yields NULL.
  */
case class CmsMerge(child: Expression,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsMergeBuffer]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): CmsMergeBuffer =
    new CmsMergeBuffer(null)

  private def read(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def update(buf: CmsMergeBuffer, input: InternalRow): CmsMergeBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val other = read(v.asInstanceOf[Array[Byte]])
      if (buf.sk == null) buf.sk = other else buf.sk.mergeInPlace(other)
    }
    buf
  }

  override def merge(a: CmsMergeBuffer, b: CmsMergeBuffer): CmsMergeBuffer = {
    if (b.sk != null) {
      if (a.sk == null) a.sk = b.sk else a.sk.mergeInPlace(b.sk)
    }
    a
  }

  override def eval(buf: CmsMergeBuffer): Any =
    if (buf.sk == null) null else serialize(buf)

  override def serialize(buf: CmsMergeBuffer): Array[Byte] =
    if (buf.sk == null) Array.emptyByteArray
    else {
      val bos = new java.io.ByteArrayOutputStream()
      buf.sk.writeTo(bos)
      bos.toByteArray
    }

  override def deserialize(bytes: Array[Byte]): CmsMergeBuffer =
    if (bytes.isEmpty) new CmsMergeBuffer(null)
    else new CmsMergeBuffer(read(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsMerge =
    copy(child = newChild)
  override def prettyName: String = "graft_cms_merge"
}

object CmsFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Aggregate Column: union-merge of serialized count-min sketches. */
  def cmsMerge(c: Column): Column =
    column(CmsMerge(expression(c)).toAggregateExpression())
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Top-k values per group (descending) as a custom
  * `TypedImperativeAggregate` over a bounded min-heap.
  *
  * Why a custom aggregate: the window formulation
  * (`row_number() OVER (... ORDER BY v DESC) <= k`) sorts EVERY group's
  * full contents; this buffer holds exactly k doubles per group, updates
  * in O(log k) per row, and merges map-side — at 100 TB the difference
  * between a per-group sort and a fixed-size sketch-style state. Follows
  * the same partial/final aggregation contract as the built-ins, so it
  * composes with groupBy/rollup/window untouched.
  *
  * Semantics: largest k values including duplicates, returned sorted
  * descending; empty groups return an empty array. Input must be
  * DoubleType (cast first); nulls are skipped.
  */
case class TopKDesc(child: Expression, k: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Double]]
  with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Double] =
    new java.util.PriorityQueue[java.lang.Double](k + 1)

  override def update(buf: java.util.PriorityQueue[java.lang.Double],
                      input: InternalRow): java.util.PriorityQueue[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (buf.size < k) buf.offer(d)
      else if (buf.peek() < d) { buf.poll(); buf.offer(d) }
    }
    buf
  }

  override def merge(a: java.util.PriorityQueue[java.lang.Double],
                     b: java.util.PriorityQueue[java.lang.Double]): java.util.PriorityQueue[java.lang.Double] = {
    val it = b.iterator()
    while (it.hasNext) {
      val d = it.next()
      if (a.size < k) a.offer(d)
      else if (a.peek() < d) { a.poll(); a.offer(d) }
    }
    a
  }

  override def eval(buf: java.util.PriorityQueue[java.lang.Double]): Any = {
    val arr = new Array[Double](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    // ascending → reverse for descending
    val out = new Array[Any](arr.length)
    var j = 0
    while (j < arr.length) { out(j) = arr(arr.length - 1 - j); j += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.PriorityQueue[java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putDouble(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    var i = 0
    while (i < n) { q.offer(bb.getDouble); i += 1 }
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKDesc =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKDesc =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKDesc =
    copy(child = newChild)
  override def prettyName: String = "graft_topk"
}

object TopKFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Aggregate Column: largest k values of `c` (cast to double), sorted
    * descending. */
  def topKDesc(c: Column, k: Int): Column =
    column(TopKDesc(expression(c.cast("double")), k).toAggregateExpression())
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** One (score, payload, carry) entry of the bounded top-k heap. */
private[functions] final class ScoredPair(val score: Double,
                                          val payload: Long,
                                          val carry: Double)

/** Top-k (payload, carry) pairs per group by (score DESC, payload ASC) —
  * the aggregate replacement for the
  * `row_number() OVER (PARTITION BY id ORDER BY score DESC, payload ASC)
  * <= k` rank cut.
  *
  * Why a custom aggregate: a rank window cannot partial-aggregate, so
  * EVERY candidate row crosses the shuffle and sorts inside its
  * partition — for LSH top-k that is 2×|candidate pairs| rows (67 M at
  * the 150k-user profiles probe). This buffer holds exactly k entries
  * per group, updates in O(log k), and merges MAP-SIDE, so the exchange
  * carries at most k rows per (group, map partition) and nothing sorts.
  * Same partial/final contract as the built-ins.
  *
  * Semantics: the k entries with the highest `score`, ties broken by the
  * SMALLEST `payload` (a total order whenever payloads are unique within
  * a group, as LSH candidate pairs are) — bit-identical to the window
  * formulation's keep-set and order. Returns array<struct<payload,
  * carry>> best-first; empty groups return an empty array. Null scores/
  * payloads are skipped. `carry` rides along un-compared (e.g. the RAW
  * cosine while `score` is its rounded tie-break form).
  */
case class TopKPairsDesc(score: Expression, payload: Expression,
                         carry: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[ScoredPair]]
  with TernaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def first: Expression = score
  override def second: Expression = payload
  override def third: Expression = carry

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("payload", LongType, nullable = false),
    StructField("carry", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  private def worstFirst = TopKPairsDesc.WorstFirst

  override def createAggregationBuffer(): java.util.PriorityQueue[ScoredPair] =
    new java.util.PriorityQueue[ScoredPair](k + 1, worstFirst)

  private def offer(buf: java.util.PriorityQueue[ScoredPair],
                    s: Double, p: Long, c: Double): Unit = {
    if (buf.size < k) buf.offer(new ScoredPair(s, p, c))
    else {
      val h = buf.peek()
      if (s > h.score || (s == h.score && p < h.payload)) {
        buf.poll(); buf.offer(new ScoredPair(s, p, c))
      }
    }
  }

  override def update(buf: java.util.PriorityQueue[ScoredPair],
                      input: InternalRow): java.util.PriorityQueue[ScoredPair] = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null) {
      val c = carry.eval(input)
      offer(buf, s.asInstanceOf[Double], p.asInstanceOf[Long],
        if (c == null) 0.0 else c.asInstanceOf[Double])
    }
    buf
  }

  override def merge(a: java.util.PriorityQueue[ScoredPair],
                     b: java.util.PriorityQueue[ScoredPair]): java.util.PriorityQueue[ScoredPair] = {
    val it = b.iterator()
    while (it.hasNext) { val e = it.next(); offer(a, e.score, e.payload, e.carry) }
    a
  }

  override def eval(buf: java.util.PriorityQueue[ScoredPair]): Any = {
    val arr = new Array[ScoredPair](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    // best-first = reverse of the worst-first comparator
    java.util.Arrays.sort(arr, worstFirst.reversed())
    val out = new Array[Any](arr.length)
    var j = 0
    while (j < arr.length) {
      out(j) = new GenericInternalRow(Array[Any](arr(j).payload, arr(j).carry))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.PriorityQueue[ScoredPair]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 24 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putDouble(e.score); bb.putLong(e.payload); bb.putDouble(e.carry)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[ScoredPair] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    var i = 0
    while (i < n) { q.offer(new ScoredPair(bb.getDouble, bb.getLong, bb.getDouble)); i += 1 }
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsDesc =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsDesc =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): TopKPairsDesc =
    copy(score = newFirst, payload = newSecond, carry = newThird)
  override def prettyName: String = "graft_topk_pairs"
}

object TopKPairsDesc {
  /** PQ head = the entry to evict = the WORST: lowest score, ties broken
    * by LARGEST payload (since smaller payload wins). A named
    * serializable object — the expression ships to executors. */
  object WorstFirst extends java.util.Comparator[ScoredPair] with Serializable {
    override def compare(a: ScoredPair, b: ScoredPair): Int = {
      val c = java.lang.Double.compare(a.score, b.score)
      if (c != 0) c else java.lang.Long.compare(b.payload, a.payload)
    }
  }
}

object TopKPairsFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Aggregate Column: top-k (payload, carry) by (score desc, payload
    * asc) as array<struct<payload,carry>> best-first. `payload` must be
    * integral (cast to long first); `score`/`carry` are cast to double. */
  def topKPairsDesc(score: Column, payload: Column, carry: Column,
                    k: Int): Column =
    column(TopKPairsDesc(expression(score.cast("double")),
      expression(payload.cast("long")), expression(carry.cast("double")),
      k).toAggregateExpression())
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** One buffered entry: score + tie-break payload + opaque carry values. */
private[functions] final class SelectedEntry(val score: Any,
                                             val payload: Any,
                                             val carry: Array[Any])

/** Generalized bounded top-k select — the aggregate replacement for
  * `row_number() OVER (PARTITION BY g ORDER BY score [DESC], payload ASC)
  * <= k` over ANY orderable score/payload types, with extra columns
  * riding along un-compared.
  *
  * [[TopKPairsDesc]] is the lean double/long specialization on the ANN
  * hot paths; this variant exists for the rank cuts those types can't
  * express — string-keyed orderings (TF-IDF terms per doc, md5-ordered
  * per-source caps) and multi-column payloads. Same scale argument: the
  * window form shuffles and sorts every candidate row (and a
  * low-cardinality PARTITION BY — e.g. per-source caps — concentrates
  * the entire corpus into #groups sort tasks), while this buffer holds
  * at most k entries per group, merges MAP-SIDE, and ships ≤ k rows per
  * (group, map partition).
  *
  * Ordering: score descending when `scoreDesc` (ascending otherwise),
  * ties toward the SMALLEST payload — a total order whenever payloads
  * are unique within a group. Output is array<struct<payload, score,
  * c0..cN>> in rank order; null scores/payloads are skipped (carries may
  * be null). Score and payload must be atomic (orderable) types;
  * comparisons use Spark's interpreted orderings, so string order is the
  * same binary UTF8 order a SortExec would apply.
  */
case class TopKSelect(score: Expression, payload: Expression,
                      carry: Seq[Expression], k: Int, scoreDesc: Boolean,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[SelectedEntry]] {

  require(k > 0, "k must be positive")

  // children may be unresolved at construction — type checks belong here
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.catalyst.expressions.RowOrdering
    if (!RowOrdering.isOrderable(score.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"score must be an orderable type, got ${score.dataType}")
    else if (!RowOrdering.isOrderable(payload.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"payload must be an orderable type, got ${payload.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def children: Seq[Expression] = score +: payload +: carry
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKSelect =
    copy(score = newChildren(0), payload = newChildren(1),
      carry = newChildren.drop(2))

  override def dataType: DataType = ArrayType(StructType(
    StructField("payload", payload.dataType, nullable = false) +:
      StructField("score", score.dataType, nullable = false) +:
      carry.zipWithIndex.map { case (c, i) =>
        StructField(s"c$i", c.dataType, c.nullable)
      }), containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val scoreOrd =
    TypeUtils.getInterpretedOrdering(score.dataType)
  @transient private lazy val payloadOrd =
    TypeUtils.getInterpretedOrdering(payload.dataType)

  /** True iff (sA, pA) ranks strictly before (sB, pB) in output order. */
  private def outranks(sA: Any, pA: Any, sB: Any, pB: Any): Boolean = {
    val c = scoreOrd.compare(sA, sB)
    val oriented = if (scoreDesc) -c else c
    if (oriented != 0) oriented < 0 else payloadOrd.compare(pA, pB) < 0
  }

  /** PQ head = the entry to evict = the LAST in output order. */
  @transient private lazy val worstFirst =
    new java.util.Comparator[SelectedEntry] with Serializable {
      override def compare(a: SelectedEntry, b: SelectedEntry): Int =
        if (outranks(a.score, a.payload, b.score, b.payload)) 1
        else if (outranks(b.score, b.payload, a.score, a.payload)) -1
        else 0
    }

  override def createAggregationBuffer(): java.util.PriorityQueue[SelectedEntry] =
    new java.util.PriorityQueue[SelectedEntry](k + 1, worstFirst)

  private def offer(buf: java.util.PriorityQueue[SelectedEntry],
                    e: SelectedEntry): Unit = {
    if (buf.size < k) buf.offer(e)
    else if (outranks(e.score, e.payload, buf.peek().score, buf.peek().payload)) {
      buf.poll(); buf.offer(e)
    }
  }

  override def update(buf: java.util.PriorityQueue[SelectedEntry],
                      input: InternalRow): java.util.PriorityQueue[SelectedEntry] = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null) {
      // reject before copying: a full buffer whose worst entry outranks
      // this row never materializes the row's carries
      val full = buf.size >= k
      if (!full || outranks(s, p, buf.peek().score, buf.peek().payload)) {
        val cs = new Array[Any](carry.length)
        var i = 0
        while (i < carry.length) {
          cs(i) = InternalRow.copyValue(carry(i).eval(input)); i += 1
        }
        if (full) buf.poll()
        buf.offer(new SelectedEntry(InternalRow.copyValue(s),
          InternalRow.copyValue(p), cs))
      }
    }
    buf
  }

  override def merge(a: java.util.PriorityQueue[SelectedEntry],
                     b: java.util.PriorityQueue[SelectedEntry]): java.util.PriorityQueue[SelectedEntry] = {
    val it = b.iterator()
    while (it.hasNext) offer(a, it.next())
    a
  }

  override def eval(buf: java.util.PriorityQueue[SelectedEntry]): Any = {
    val arr = new Array[SelectedEntry](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr, worstFirst.reversed())
    val out = new Array[Any](arr.length)
    var j = 0
    while (j < arr.length) {
      val vals = new Array[Any](2 + carry.length)
      vals(0) = arr(j).payload
      vals(1) = arr(j).score
      var c = 0
      while (c < carry.length) { vals(2 + c) = arr(j).carry(c); c += 1 }
      out(j) = new GenericInternalRow(vals)
      j += 1
    }
    new GenericArrayData(out)
  }

  // entries serialize through an UnsafeProjection over (score, payload,
  // carries) — fixed schema, so each entry is one length-framed UnsafeRow
  @transient private lazy val entryTypes: Array[DataType] =
    (score.dataType +: payload.dataType +: carry.map(_.dataType)).toArray
  @transient private lazy val serProj = UnsafeProjection.create(entryTypes)

  override def serialize(buf: java.util.PriorityQueue[SelectedEntry]): Array[Byte] = {
    val rows = new Array[Array[Byte]](buf.size)
    var total = 4
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      val vals = new Array[Any](entryTypes.length)
      vals(0) = e.score; vals(1) = e.payload
      var c = 0
      while (c < carry.length) { vals(2 + c) = e.carry(c); c += 1 }
      // the projection REUSES its result buffer across calls — copy()
      // materializes this entry into its own exact-size array
      rows(i) = serProj(new GenericInternalRow(vals)).copy().getBytes
      total += 4 + rows(i).length
      i += 1
    }
    val bb = ByteBuffer.allocate(total)
    bb.putInt(rows.length)
    rows.foreach { r => bb.putInt(r.length); bb.put(r) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[SelectedEntry] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val slice = new Array[Byte](len)
      bb.get(slice)
      val ur = new UnsafeRow(entryTypes.length)
      ur.pointTo(slice, len)
      val cs = new Array[Any](carry.length)
      var c = 0
      while (c < carry.length) {
        cs(c) = InternalRow.copyValue(ur.get(2 + c, entryTypes(2 + c))); c += 1
      }
      q.offer(new SelectedEntry(
        InternalRow.copyValue(ur.get(0, entryTypes(0))),
        InternalRow.copyValue(ur.get(1, entryTypes(1))), cs))
      i += 1
    }
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSelect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSelect =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "graft_topk_select"
}

object TopKSelectFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Aggregate Column: top-k entries by (score desc-or-asc, payload asc)
    * as array<struct<payload, score, c0..cN>> in rank order. */
  def topKSelect(score: Column, payload: Column, carry: Seq[Column],
                 k: Int, scoreDesc: Boolean = true): Column =
    column(TopKSelect(expression(score), expression(payload),
      carry.map(expression), k, scoreDesc).toAggregateExpression())
}

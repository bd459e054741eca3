package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k (sim desc, id asc) pair aggregate — the ANN ranking
  * kernel that replaces `row_number().over(partitionBy(query_id)
  * .orderBy(sim.desc, id.asc)) <= k`.
  *
  * Why: the window form plans Sort → WindowGroupLimit(partial) →
  * Exchange → Sort → WindowGroupLimit(final) → Window. The partial
  * group limit caps what crosses the exchange, but each scan task
  * still fully SORTS its entire pair stream (|corpus slice| × |queries|
  * rows for the broadcast-join search paths) before the limit can
  * drop anything — O(N log N) on N pairs kept only to discard all but
  * k·|queries| of them. This aggregate keeps a k-bounded binary heap
  * per query instead: O(N) comparisons against the current k-th best
  * (heap root), O(log k) on the rare displacing insert, nothing
  * sorted until the k survivors at eval. Map-side partial aggregation
  * means only (|queries| × k)-sized buffers ride the exchange — the
  * same shuffle volume as the partial group limit, minus the sorts.
  *
  * Ordering is EXACTLY Spark's `sim.desc, id.asc` sort on
  * (DoubleType, LongType): descending `java.lang.Double.compare`
  * (NaN above all numbers, -0.0 below 0.0), null sims last
  * (desc_nulls_last default), null ids first among sim-ties
  * (asc_nulls_first default). The rank a consumer derives from the
  * output array position is therefore bit-identical to the
  * row_number the window form assigned.
  *
  * Output: array<struct<neighbor_id: bigint, sim: double>>, best
  * first, at most k entries.
  */
object TopKPairs {
  def of(sim: Column, id: Column, k: Int): Column = {
    require(k >= 1, s"top-k wants k >= 1, got $k")
    ColumnBridge.column(TopKPairsAgg(
      ColumnBridge.expression(sim), ColumnBridge.expression(id), k)
      .toAggregateExpression())
  }
}

/** The heap buffer: parallel arrays, root (index 0) holds the WORST
  * kept entry so a candidate only pays O(log k) when it displaces it.
  * Flag bits: 1 = sim null, 2 = id null. */
final class TopKPairsBuffer(val k: Int) {
  var size: Int = 0
  val sims: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)
  val flags: Array[Byte] = new Array[Byte](k)

  /** a strictly outranks b under (sim desc_nulls_last, id asc_nulls_first). */
  private def better(sa: Double, ia: Long, fa: Byte,
      sb: Double, ib: Long, fb: Byte): Boolean = {
    val aSimNull = (fa & 1) != 0; val bSimNull = (fb & 1) != 0
    if (aSimNull != bSimNull) return !aSimNull
    if (!aSimNull) {
      // +0.0 add normalizes -0.0 to 0.0 (leaves every other value,
      // including NaN, alone): Spark's sort runs behind
      // NormalizeFloatingNumbers, so the window form ties -0.0 with
      // 0.0 and breaks by id — Double.compare alone would order them
      val c = java.lang.Double.compare(sa + 0.0, sb + 0.0)
      if (c != 0) return c > 0
    }
    val aIdNull = (fa & 2) != 0; val bIdNull = (fb & 2) != 0
    if (aIdNull != bIdNull) return aIdNull
    if (aIdNull) return false
    ia < ib
  }

  /** entry j ranks strictly after (is worse than) entry i. */
  private def worseThan(j: Int, i: Int): Boolean =
    better(sims(i), ids(i), flags(i), sims(j), ids(j), flags(j))

  private def swap(i: Int, j: Int): Unit = {
    val s = sims(i); sims(i) = sims(j); sims(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
    val f = flags(i); flags(i) = flags(j); flags(j) = f
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      // heap invariant: parent is no better (= as bad or worse) than
      // its children; bubble a worse-than-parent entry up
      if (better(sims(p), ids(p), flags(p), sims(i), ids(i), flags(i))) {
        swap(i, p); i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var w = i
      if (l < size && worseThan(l, w)) w = l
      if (r < size && worseThan(r, w)) w = r
      if (w == i) return
      swap(i, w); i = w
    }
  }

  def insert(s: Double, id: Long, f: Byte): Unit =
    if (size < k) {
      sims(size) = s; ids(size) = id; flags(size) = f
      size += 1; siftUp(size - 1)
    } else if (better(s, id, f, sims(0), ids(0), flags(0))) {
      sims(0) = s; ids(0) = id; flags(0) = f
      siftDown()
    }

  def merge(other: TopKPairsBuffer): Unit = {
    var i = 0
    while (i < other.size) {
      insert(other.sims(i), other.ids(i), other.flags(i)); i += 1
    }
  }

  /** Indices of the kept entries, best first. */
  def rankedOrder(): Array[Int] = {
    val idx = Array.range(0, size)
    // best-first = reverse of the heap's badness order; a plain sort
    // by the ranking comparator (boxed but k-bounded)
    idx.sortWith((a, b) =>
      better(sims(a), ids(a), flags(a), sims(b), ids(b), flags(b)))
  }
}

case class TopKPairsAgg(
    left: Expression, // sim: double
    right: Expression, // id: long
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairsBuffer]
  with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_pairs wants (DOUBLE sim, BIGINT id), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("neighbor_id", LongType),
      StructField("sim", DoubleType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs"

  override def createAggregationBuffer(): TopKPairsBuffer =
    new TopKPairsBuffer(k)

  override def update(buf: TopKPairsBuffer, input: InternalRow): TopKPairsBuffer = {
    val s = left.eval(input)
    val id = right.eval(input)
    var f = 0
    if (s == null) f |= 1
    if (id == null) f |= 2
    buf.insert(
      if (s == null) 0.0 else s.asInstanceOf[Double],
      if (id == null) 0L else id.asInstanceOf[Long],
      f.toByte)
    buf
  }

  override def merge(buf: TopKPairsBuffer, other: TopKPairsBuffer): TopKPairsBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: TopKPairsBuffer): Any = {
    val order = buf.rankedOrder()
    val out = new Array[Any](order.length)
    var i = 0
    while (i < order.length) {
      val j = order(i)
      out(i) = new GenericInternalRow(Array[Any](
        if ((buf.flags(j) & 2) != 0) null else buf.ids(j),
        if ((buf.flags(j) & 1) != 0) null else buf.sims(j)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKPairsBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 17 * buf.size)
    bb.putInt(buf.k); bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.sims(i)); bb.putLong(buf.ids(i)); bb.put(buf.flags(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairsBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val bufK = bb.getInt
    val n = bb.getInt
    val buf = new TopKPairsBuffer(bufK)
    var i = 0
    while (i < n) {
      buf.insert(bb.getDouble, bb.getLong, bb.get)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairsAgg =
    copy(left = newLeft, right = newRight)
}

package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k largest (score, id) pairs per
  * group in a size-k binary heap. The scale-correct alternative to the
  * `row_number() over (partition by g order by s) <= k` pattern, which
  * must shuffle and SORT every row of every group — this aggregate
  * carries at most k entries per group through partial aggregation, so
  * map-side combine bounds both shuffle volume (k rows per group per
  * mapper) and memory (no per-group sort buffers).
  *
  * Ordering is pinned: score descending, then id ascending — ties are
  * deterministic and oracle-checkable. Output is the sorted
  * `array<struct<score double, id bigint>>`.
  */
case class TopKByAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByAgg.Heap] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKByAgg.Heap = new TopKByAgg.Heap(k)

  override def update(buf: TopKByAgg.Heap, input: InternalRow): TopKByAgg.Heap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKByAgg.Heap, other: TopKByAgg.Heap): TopKByAgg.Heap = {
    other.foreach((s, i) => buf.offer(s, i))
    buf
  }

  override def eval(buf: TopKByAgg.Heap): Any = {
    val sorted = buf.sortedDesc()
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKByAgg.Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKByAgg.Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val h = new TopKByAgg.Heap(k)
    var i = 0
    while (i < n) { h.offer(in.readDouble(), in.readLong()); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByAgg {

  /** Size-bounded min-heap under (score asc, id desc) — the root is
    * the entry that top-k evicts first. Plain arrays; no boxing.
    */
  final class Heap(k: Int) {
    private val scores = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0

    def size: Int = n

    /** a-entry is "worse" than b-entry under top-k (score desc, id asc):
      * lower score, or equal score with larger id.
      */
    private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
      sa < sb || (sa == sb && ia > ib)

    def offer(s: Double, i: Long): Unit = {
      if (n < k) {
        scores(n) = s; ids(n) = i; n += 1
        siftUp(n - 1)
      } else if (worse(scores(0), ids(0), s, i)) {
        scores(0) = s; ids(0) = i
        siftDown(0)
      }
    }

    private def siftUp(pos0: Int): Unit = {
      var pos = pos0
      while (pos > 0) {
        val parent = (pos - 1) >> 1
        if (worse(scores(pos), ids(pos), scores(parent), ids(parent))) {
          swap(pos, parent); pos = parent
        } else return
      }
    }

    private def siftDown(pos0: Int): Unit = {
      var pos = pos0
      while (true) {
        var smallest = pos
        val l = 2 * pos + 1
        val r = 2 * pos + 2
        if (l < n && worse(scores(l), ids(l), scores(smallest), ids(smallest))) smallest = l
        if (r < n && worse(scores(r), ids(r), scores(smallest), ids(smallest))) smallest = r
        if (smallest == pos) return
        swap(pos, smallest)
        pos = smallest
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(scores(i), ids(i)); i += 1 }
    }

    /** Entries as (score desc, id asc). */
    def sortedDesc(): Array[(Double, Long)] = {
      val arr = Array.tabulate(n)(i => (scores(i), ids(i)))
      arr.sortBy { case (s, i) => (-s, i) }
    }
  }

  /** Column API: `topKBy(score, id, k)` → sorted array of the k
    * largest (score, id) structs per group.
    */
  def topKBy(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByAgg(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}

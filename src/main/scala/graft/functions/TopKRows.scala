package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a `TypedImperativeAggregate` over raw
  * `InternalRow`s — the physical-layer sibling of the typed
  * [[TopKByScore]] `Aggregator`. Same partial-aggregation property
  * (only k rows per group per partition reach the shuffle), but no
  * encoder round-trip: the typed Aggregator deserializes every input
  * row into a Scala tuple and re-encodes the buffer per update, which
  * at 600k rows/group dominates the query. This one reads three
  * primitive fields per update into a k-bounded binary heap.
  *
  * Ordering (the O2 determinism invariant): score DESC, id1 ASC,
  * id2 ASC. `eval` emits best-first, so `posexplode` position + 1 is
  * the rank. TopKAggSpec proves result-equality with [[TopKByScore]].
  */
object TopKRows {
  /** agg column: array<struct<score double, id1 long, id2 int>>. */
  def topK(score: Column, id1: Column, id2: Column, k: Int): Column =
    Bridge.column(
      TopKRowsAgg(Bridge.expression(score), Bridge.expression(id1),
        Bridge.expression(id2), k).toAggregateExpression())
}

/** One group's bounded buffer: worst-kept entry at heap root. */
final class TopKHeap(val k: Int) {
  // parallel arrays, heap-ordered by "worst first"
  val scores = new Array[Double](k)
  val id1s = new Array[Long](k)
  val id2s = new Array[Int](k)
  var size = 0

  /** true if (s1,a1,b1) ranks WORSE than (s2,a2,b2) in score DESC,
    * id1 ASC, id2 ASC order. */
  @inline private def worse(s1: Double, a1: Long, b1: Int,
      s2: Double, a2: Long, b2: Int): Boolean =
    s1 < s2 || (s1 == s2 && (a1 > a2 || (a1 == a2 && b1 > b2)))

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(scores(i), id1s(i), id2s(i), scores(p), id1s(p), id2s(p))) {
        swap(i, p); i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var w = i
      if (l < size && worse(scores(l), id1s(l), id2s(l), scores(w), id1s(w), id2s(w))) w = l
      if (r < size && worse(scores(r), id1s(r), id2s(r), scores(w), id1s(w), id2s(w))) w = r
      if (w == i) return
      swap(i, w); i = w
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val a = id1s(i); id1s(i) = id1s(j); id1s(j) = a
    val b = id2s(i); id2s(i) = id2s(j); id2s(j) = b
  }

  def add(s: Double, a: Long, b: Int): Unit = {
    if (size < k) {
      scores(size) = s; id1s(size) = a; id2s(size) = b
      size += 1; siftUp(size - 1)
    } else if (worse(scores(0), id1s(0), id2s(0), s, a, b)) {
      scores(0) = s; id1s(0) = a; id2s(0) = b
      siftDown()
    }
  }

  /** indices of entries sorted best-first. */
  def sortedIndices: Array[Int] =
    (0 until size).sortWith((i, j) =>
      worse(scores(j), id1s(j), id2s(j), scores(i), id1s(i), id2s(i))).toArray
}

case class TopKRowsAgg(score: Expression, id1: Expression, id2: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] {

  override def children: Seq[Expression] = Seq(score, id1, id2)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id1", LongType, nullable = false),
    StructField("id2", IntegerType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input); val a = id1.eval(input); val b = id2.eval(input)
    if (s != null && a != null && b != null)
      buf.add(s.asInstanceOf[Double], a.asInstanceOf[Long], b.asInstanceOf[Int])
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) { buf.add(other.scores(i), other.id1s(i), other.id2s(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKHeap): Any = {
    val idx = buf.sortedIndices
    val out = new Array[Any](idx.length)
    var i = 0
    while (i < idx.length) {
      val j = idx(i)
      out(i) = new GenericInternalRow(
        Array[Any](buf.scores(j), buf.id1s(j), buf.id2s(j)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      o.writeDouble(buf.scores(i)); o.writeLong(buf.id1s(i)); o.writeInt(buf.id2s(i))
      i += 1
    }
    o.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) { h.add(in.readDouble(), in.readLong(), in.readInt()); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKRowsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKRowsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(score = cs(0), id1 = cs(1), id2 = cs(2))
  override def prettyName: String = "topk_rows"
}

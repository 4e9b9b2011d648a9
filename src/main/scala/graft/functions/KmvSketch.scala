package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-value sketch as a bounded-state
  * `TypedImperativeAggregate`: the k smallest DISTINCT values of a
  * Long hash column, emitted as a sorted ascending array<long>.
  *
  * This is the Bar-Yossef/Beyer bottom-k sketch (Beyer et al., "On
  * Synopses for Distinct-Value Estimation Under Multiset Operations",
  * SIGMOD 2007): because the k smallest distinct values of a union are
  * computable from the k smallest of each operand, two corpus-sized
  * scans reduce to two k-row sketches that estimate |A∪B|, |A∩B| and
  * Jaccard without ever joining the corpora. The aggregate has the
  * same partial-aggregation property as [[TopKRows]] — every map task
  * sends at most k longs to the merge — so the sketch build is one
  * scan with NO shuffle of the value space (contrast a distinct():
  * a full hash repartition of every distinct value).
  *
  * Determinism: the sketch content is a pure function of the input
  * value SET (k smallest distinct), independent of row order,
  * partitioning, or merge tree — which is what lets a DuckDB oracle
  * reproduce it bit-for-bit with `SELECT DISTINCT h ORDER BY h LIMIT k`.
  *
  * Reference analogue: the reference keeps its whole index in one
  * process and answers set questions by brute scan
  * (`src/search.ts:42-52`); a sketch is what replaces "scan both
  * sides" when neither side fits a process.
  */
object KmvSketch {
  /** agg column: sorted array<long> of the ≤k smallest distinct values
    * of `h` (nulls ignored).
    */
  def kmv(h: Column, k: Int): Column =
    Bridge.column(KmvSketchAgg(Bridge.expression(h), k).toAggregateExpression())
}

/** One group's bounded state: a capped ordered set — insert is a
  * no-op once the candidate is ≥ the current kth-smallest.
  */
final class KmvState(val k: Int) {
  require(k > 0, s"kmv sketch size k must be positive, got $k")
  val set = new java.util.TreeSet[java.lang.Long]()
  def add(v: Long): Unit = {
    if (set.size() < k) set.add(v)
    else if (v < set.last() && set.add(v)) { set.pollLast(); () }
  }
}

case class KmvSketchAgg(h: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvState] {

  require(k > 0, s"kmv_sketch k must be positive, got $k")

  override def children: Seq[Expression] = Seq(h)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(buf: KmvState, input: InternalRow): KmvState = {
    val v = h.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvState, other: KmvState): KmvState = {
    val it = other.set.iterator()
    while (it.hasNext) buf.add(it.next())
    buf
  }

  override def eval(buf: KmvState): Any = {
    // TreeSet iterates ascending — already the canonical order
    val out = new Array[Any](buf.set.size())
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: KmvState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.writeInt(buf.set.size())
    val it = buf.set.iterator()
    while (it.hasNext) o.writeLong(it.next().longValue())
    o.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = new KmvState(k)
    var i = 0
    while (i < n) { s.add(in.readLong()); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(h = cs(0))
  override def prettyName: String = "kmv_sketch"
}

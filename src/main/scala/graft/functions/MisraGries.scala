package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as a `TypedImperativeAggregate`:
  * at most `m` (term, weight) counters per aggregation buffer, with the
  * classic decrement step on overflow and the mergeable-summaries merge
  * (add counters, then subtract the (m+1)-th largest weight from all and
  * drop the non-positive ones — Agarwal et al., "Mergeable Summaries",
  * PODS 2012). Invariant carried through updates AND merges: for every
  * term, trueCount − weight(term) ≤ n/(m+1) where n is the total stream
  * weight, and a term absent from the summary has weight 0 — so every
  * term with true count > n/(m+1) is guaranteed to survive.
  *
  * This is the candidate-generation half of the exact two-pass heavy-
  * hitters operator (t20): pass 1 runs this sketch (m counters per
  * partition reach the shuffle — never the token multiset), pass 2
  * re-counts ONLY the surviving candidates exactly and attests
  * kth_count·(m+1) > n, which by the invariant proves no non-candidate
  * could have placed in the top k. At 100 TB the full-vocabulary
  * groupBy of t5/t7 shuffles billions of distinct web tokens; this
  * shuffles 32·m counters in pass 1 and ≤m exact partial counts per
  * partition in pass 2, a constant-state plan at any corpus size.
  *
  * Reference analogue: the reference has no sketch aggregates (its
  * corpus fits one browser tab, `src/database.ts:194-200` upserts rows
  * one by one); this is the scale path the brief's training-data
  * pipeline needs.
  */
object MisraGries {
  /** agg column: array<struct<term string, w long>> — the surviving
    * counters, term-ASC ordered (deterministic output for a summary
    * whose counter VALUES are stream-order dependent; only membership
    * and the invariant matter downstream).
    */
  def sketch(term: Column, m: Int): Column =
    Bridge.column(MisraGriesAgg(Bridge.expression(term), m).toAggregateExpression())
}

/** One buffer's counters. Plain open-addressed-ish mutable map keyed by
  * String (UTF8String inputs are copied on first insert — Spark reuses
  * the backing bytes across rows).
  */
final class MGSummary(val m: Int) {
  val counts = new java.util.HashMap[String, Long](m * 2)

  def add(term: String, w: Long): Unit = {
    val cur = counts.getOrDefault(term, 0L)
    if (cur > 0L) counts.put(term, cur + w)
    else if (counts.size < m) counts.put(term, w)
    else {
      // decrement-all by the smallest of (w, min counter): one pass
      // amortizes repeated single decrements when w > 1 is ever used.
      var dec = w
      val it0 = counts.values().iterator()
      while (it0.hasNext) { val v = it0.next(); if (v < dec) dec = v }
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - dec
        if (nv <= 0L) it.remove() else e.setValue(nv)
      }
      if (w > dec) add(term, w - dec) // room freed unless w was the min
    }
  }

  /** Mergeable-summaries merge: pointwise add, then if over capacity
    * subtract the (m+1)-th largest weight from every counter and drop
    * the non-positive remainder (keeps exactly ≤ m counters and the
    * additive-error invariant).
    */
  def mergeIn(other: MGSummary): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      counts.put(e.getKey, counts.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (counts.size > m) {
      val ws = new Array[Long](counts.size)
      var i = 0
      val vi = counts.values().iterator()
      while (vi.hasNext) { ws(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(ws)
      val cut = ws(counts.size - m - 1) // (m+1)-th largest
      val ei = counts.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        val nv = e.getValue - cut
        if (nv <= 0L) ei.remove() else e.setValue(nv)
      }
    }
  }
}

case class MisraGriesAgg(term: Expression, m: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGSummary] {
  require(m >= 1, "Misra-Gries needs at least one counter")

  override def children: Seq[Expression] = Seq(term)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("w", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): MGSummary = new MGSummary(m)

  override def update(buf: MGSummary, input: InternalRow): MGSummary = {
    val t = term.eval(input)
    if (t != null) buf.add(t.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: MGSummary, other: MGSummary): MGSummary = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: MGSummary): Any = {
    val terms = new Array[String](buf.counts.size)
    buf.counts.keySet().toArray(terms)
    java.util.Arrays.sort(terms, java.util.Comparator.naturalOrder[String]())
    val out = new Array[Any](terms.length)
    var i = 0
    while (i < terms.length) {
      out(i) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(terms(i)), buf.counts.get(terms(i))))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: MGSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.writeInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      o.writeInt(b.length); o.write(b); o.writeLong(e.getValue)
    }
    o.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = new MGSummary(m)
    var i = 0
    while (i < n) {
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      s.counts.put(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(term = cs(0))
  override def prettyName: String = "misra_gries"
}

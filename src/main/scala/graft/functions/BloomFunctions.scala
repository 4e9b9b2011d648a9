package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join pruning — the 100 TB pattern where a compact
  * sketch of the small (build) side's join keys is shipped to every
  * task scanning the large (probe) side, discarding non-joining rows
  * BEFORE the shuffle. False positives are fine: the exact join that
  * follows removes them, so the final result is byte-identical to the
  * plain join (which is what the DuckDB oracle checks). No false
  * negatives, so no rows are lost.
  *
  * Spark's own InjectRuntimeFilter rule does this automatically for
  * qualifying shuffle joins; this expression is the explicit form for
  * when the build side is computed driver-side (e.g. a pre-aggregated
  * id list) or the plan shape doesn't qualify.
  */
object BloomFunctions {

  /** Prefilter `keyCol` (long) against a driver-built sketch. */
  def mightContain(bf: BloomFilter, keyCol: Column): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    Bridge.column(BloomMightContainLong(Bridge.expression(keyCol), BloomSketchBytes(bos.toByteArray)))
  }
}

/** Serialized sketch holder with CONTENT-based equality. A bare
  * `Array[Byte]` field in a case class compares by identity, so two
  * semantically identical expressions never canonicalize equal —
  * breaking semanticEquals/subexpression reuse — and the raw bytes
  * bloat every plan string. The digest-based toString keeps explain
  * output readable while equals/hashCode stay exact (full-content).
  */
case class BloomSketchBytes(bytes: Array[Byte]) {
  override def equals(other: Any): Boolean = other match {
    case BloomSketchBytes(o) => java.util.Arrays.equals(bytes, o)
    case _ => false
  }
  override def hashCode(): Int = java.util.Arrays.hashCode(bytes)
  override def toString: String =
    s"bloom_sketch(${bytes.length}B, murmur=${scala.util.hashing.MurmurHash3.bytesHash(bytes)})"
}

/** `bf.mightContainLong(child)` over a serialized sketch; the bytes are
  * part of the expression tree, so the sketch ships with the task
  * closure exactly once and deserializes lazily per executor.
  */
case class BloomMightContainLong(child: Expression, sketch: BloomSketchBytes)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral key, got ${t.catalogString}")
  }

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(sketch.bytes))

  override def nullSafeEval(key: Any): Any = key match {
    case l: java.lang.Long => bf.mightContainLong(l)
    case i: java.lang.Integer => bf.mightContainLong(i.toLong)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

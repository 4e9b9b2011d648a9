package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Sign-random-projection LSH bucket kernel for embedding near-dup
  * ([[graft.operators.Dedup.d5EmbedNearDup]]).
  *
  * One eval computes ALL tables' buckets: for table t, bucket_t =
  * Σ_j (dot(e, proj(t)(j)) > 0 ? 2^j : 0). The composed form — 96
  * separate DotProduct expressions under a `when` each carrying its own
  * 64-float literal — is semantically identical (proven in
  * `SrpKernelSpec`) but costs 96 expression nodes of planning/codegen
  * per query and re-reads the embedding array per projection. The dot
  * accumulates float→double in array-index order, exactly like
  * [[DotProduct]] and DuckDB's `list_inner_product` (the oracle side),
  * so bucket membership stays bit-identical across all three forms.
  *
  * CodegenFallback for the same reason as TextHashKernels: the per-row
  * work (tables × bits × dims fused multiply-adds) dwarfs one virtual
  * call, and the generated Java would just restate this loop.
  */
object SrpKernel {
  def srpBuckets(e: Column, proj: Seq[Seq[Seq[Float]]]): Column =
    Bridge.column(SrpBuckets(Bridge.expression(e), proj))
}

case class SrpBuckets(child: Expression, proj: Seq[Seq[Seq[Float]]])
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "srp_buckets"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.catalogString}")
  }

  @transient private lazy val tables: Int = proj.size
  @transient private lazy val bits: Int = proj.head.size
  // flattened [table][bit] -> weight array, resolved once per task
  @transient private lazy val flat: Array[Array[Float]] =
    proj.flatMap(_.map(_.toArray)).toArray

  // NULL-embedding parity with the composed form and the DuckDB oracle:
  // `dot(NULL, w) > 0` is NULL, whose CASE/when falls to the ELSE 0
  // branch on every bit — bucket 0 in every table, NOT a null result.
  // (UnaryExpression's default nullSafeEval would return null and
  // posexplode would then silently drop the row, desynchronizing the
  // bucket-size windows across engines.)
  override def nullable: Boolean = false
  @transient private lazy val zeroBuckets = new GenericArrayData(new Array[Long](tables))
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) zeroBuckets else nullSafeEval(v)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < bits) {
        val w = flat(t * bits + j)
        val n = math.min(arr.numElements(), w.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += arr.getFloat(i).toDouble * w(i).toDouble; i += 1 }
        if (s > 0) bucket |= 1L << j
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

  // proj is a large constant: keep toString/plan output readable
  override def toString: String = s"srp_buckets(${child}, tables=$tables, bits=$bits)"
}

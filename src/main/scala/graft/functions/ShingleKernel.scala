package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass 3-word shingling kernel.
  *
  * Computes exactly `array_distinct(zip_with(zip_with(slice(tok,1,n-2),
  * slice(tok,2,n-2), concat), slice(tok,3,n-2), concat))` over
  * `tok = split(lower(trim(text)), "\s+")` — the
  * [[graft.operators.Dedup.shingles]] HOF chain — in one tokenize +
  * one build pass per row. The HOF form evaluates three `slice` copies
  * of the token array plus two interpreted `zip_with` lambda passes
  * plus a distinct pass; this is the same fuse-the-lambda-pipeline
  * move as [[TextHashKernels]] (whose scaladoc carries the
  * CodegenFallback rationale: per-row work dwarfs the one virtual
  * call). First-occurrence order is preserved (LinkedHashSet), so the
  * result is ELEMENT-FOR-ELEMENT identical to the HOF — proven by
  * `ShingleKernelSpec` over both fixture corpora and the whitespace /
  * unicode edge cases — and every shingle-based DuckDB oracle
  * (`Dedup.shingleCte` and friends) stays bit-for-bit valid.
  *
  * Tokenization parity notes (each matched to the Catalyst operator it
  * replaces): `UTF8String.trim()` trims exactly the 0x20 spaces
  * `StringTrim` trims (tabs/newlines at the ends survive into split,
  * same as the HOF); `UTF8String.toLowerCase` is `Lower`'s own
  * lowercasing; `Pattern.split(s, -1)` is `StringSplit`'s regex split
  * with its default -1 limit (leading separator ⇒ leading empty token,
  * kept identically).
  */
object ShingleKernel {
  def shingles3(text: Column): Column =
    Bridge.column(Shingles3(Bridge.expression(text)))
}

case class Shingles3(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "shingles3"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].trim().toLowerCase.toString
    val toks = ws.split(s, -1)
    if (toks.length < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    var i = 0
    while (i <= toks.length - 3) {
      seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

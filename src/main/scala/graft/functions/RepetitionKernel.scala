package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass repetition-signal kernel for the Gopher/MassiveText
  * filters (Rae et al. 2021 §A1.1) behind `q_t15_repetition`.
  *
  * Computes, in ONE tokenize pass per document, the five integers the
  * previous formulation derived from an explode + two-function window
  * chain + three sibling aggregations (each a `doc_id` shuffle, with
  * the tokenizer re-run per consumer): token count, exact distinct
  * token count, longest same-token run, the count of the single most
  * frequent bigram, and the bigram total. The per-row state is a hash
  * set over the document's tokens and a hash map over its bigrams —
  * bounded by document length, the same working set a single window
  * partition held before. This turns t15 from four `doc_id` shuffles
  * into ZERO data shuffles (only the final presentation `orderBy`
  * remains): at corpus scale the op is now embarrassingly parallel,
  * one scan, no exchange — strictly better than caching the exploded
  * token table, which at 100 TB would materialize a tokens×columns
  * blow-up of the corpus just to feed three aggregations.
  *
  * Tokenization parity with `TextAnalysis.tokens` =
  * `split(lower(trim(text)), "\s+")`, matched operator-for-operator
  * (same notes as [[Shingles3]]): `UTF8String.trim()` trims exactly
  * the 0x20 spaces `StringTrim` trims (edge tabs/newlines survive into
  * split, producing the same boundary empty tokens), `UTF8String
  * .toLowerCase` is `Lower`'s lowercasing, `Pattern.split(s, -1)` is
  * `StringSplit`'s regex split with its default -1 limit. Rows with
  * null text vanish from the old plan at `explode` — callers replicate
  * that with an explicit null filter. Equivalence to the explode +
  * window formulation is proven row-for-row by `RepetitionKernelSpec`
  * over the documents fixture plus whitespace/unicode/degenerate edge
  * cases, so the DuckDB oracle for t15 stays bit-for-bit valid.
  *
  * CodegenFallback for the [[TextHashKernels]] reason: per-row work
  * (regex tokenize + two hash structures) dwarfs one virtual call.
  */
object RepetitionKernel {
  def repetitionStats(text: Column): Column =
    Bridge.column(RepetitionStats(Bridge.expression(text)))
}

case class RepetitionStats(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "repetition_stats"

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_run", LongType, nullable = false),
    StructField("top_bg", LongType, nullable = false),
    StructField("n_bg", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].trim().toLowerCase.toString
    val toks = ws.split(s, -1)
    val n = toks.length
    val distinct = new java.util.HashSet[String](n * 2)
    val bigrams = new java.util.HashMap[String, Long](n * 2)
    var maxRun = 0L
    var run = 0L
    var prev: String = null
    var i = 0
    while (i < n) {
      val t = toks(i)
      distinct.add(t)
      if (prev != null && prev == t) run += 1 else run = 1
      if (run > maxRun) maxRun = run
      if (prev != null) bigrams.merge(prev + " " + t, 1L, (a, b) => a + b)
      prev = t
      i += 1
    }
    var topBg = 0L
    val it = bigrams.values().iterator()
    while (it.hasNext) { val v = it.next(); if (v > topBg) topBg = v }
    new GenericInternalRow(Array[Any](
      n.toLong, distinct.size.toLong, maxRun, topBg, math.max(n - 1, 0).toLong))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

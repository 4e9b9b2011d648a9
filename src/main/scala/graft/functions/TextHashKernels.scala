package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass JVM kernels for the md5-derived dedup signatures.
  *
  * The HOF formulations in [[graft.operators.Dedup]] (`transform` +
  * `aggregate` + `zip_with`) are semantically right but evaluate one
  * interpreted lambda per token PER BIT (simhash: 32x) or per hash seed
  * (minhash: 16 passes over the shingle array). These expressions
  * compute the identical integer result in one tight loop per row —
  * same md5, same bit/affine arithmetic — so the DuckDB oracles in
  * Dedup.oracleSql stay bit-for-bit valid, verified in
  * TextHashKernelsSpec against the HOF forms.
  *
  * Mirrors the reference's derived-signature stage (the pivot-distance
  * columns of `/root/reference/src/database.ts:195-198`): a per-row
  * scalar kernel materialized at write time, scanned at query time.
  *
  * CodegenFallback is deliberate: the per-row work (dozens of md5
  * digests) dwarfs the one virtual eval() call, and a hand-rolled
  * doGenCode would just duplicate this loop as a Java string.
  */
object TextHashKernels {

  /** Thread-local MD5: MessageDigest is stateful and not thread-safe;
    * one instance per task thread amortizes the allocation.
    */
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** The task thread's digest instance (digest() leaves it reset). */
  private[functions] def md5Digest(): MessageDigest = md5Local.get()

  /** First 4 digest bytes as an unsigned 32-bit value — identical to
    * `conv(substring(md5(s), 1, 8), 16, 10)` (8 hex chars = 4 bytes).
    */
  private[functions] def hash32(bytes: Array[Byte]): Long = {
    val d = md5Local.get().digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** First 7 hex chars = first 28 bits of the digest — identical to
    * `conv(substring(md5(s), 1, 7), 16, 10)` / the oracle's
    * `('0x' || substr(md5(g), 1, 7))::BIGINT`.
    */
  private[functions] def hash28(bytes: Array[Byte]): Long = {
    val d = md5Local.get().digest(bytes)
    ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) | ((d(2) & 0xffL) << 4) | ((d(3) & 0xf0L) >>> 4)
  }

  def simhash32(tokens: Column): Column =
    Bridge.column(SimHash32(Bridge.expression(tokens)))

  def minhashSig(shingles: Column, coeffs: Seq[(Long, Long)], prime: Long): Column =
    Bridge.column(MinHashSig(Bridge.expression(shingles), coeffs, prime))

  def minhashBands(shingles: Column, coeffs: Seq[(Long, Long)], prime: Long,
      rowsPerBand: Int): Column =
    Bridge.column(MinHashBands(Bridge.expression(shingles), coeffs, prime, rowsPerBand))

  private val hexDigits = "0123456789abcdef".toCharArray

  private[functions] def toHex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** The shared min-signature loop of MinHashSig / MinHashBands. */
  private[functions] def minSig(arr: ArrayData, as: Array[Long], bs: Array[Long],
      prime: Long): Array[Long] = {
    val n = arr.numElements()
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = hash28(arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < k) {
          val v = (h * as(j) + bs(j)) % prime
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    mins
  }
}

/** Shared input contract: one array<string> argument. */
abstract class StringArrayKernel extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }
}

/** 32-bit SimHash over a token array.
  *
  * Per token: h = first-4-md5-bytes (unsigned 32-bit); for each bit b,
  * counter_b += (h>>b)&1 == 1 ? +1 : -1; signature bit b is set iff
  * counter_b > 0. Exactly the integer semantics of
  * [[graft.operators.Dedup.simhashExpr]] and its DuckDB oracle CTE.
  */
case class SimHash32(child: Expression) extends StringArrayKernel {
  override def prettyName: String = "simhash32"
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counters = new Array[Int](32)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = TextHashKernels.hash32(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 32) {
          if (((h >> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
      } else {
        // HOF/oracle parity: a null element's CASE test is NULL, which
        // falls to the ELSE -1 branch on EVERY bit — not a skip
        var b = 0
        while (b < 32) { counters(b) -= 1; b += 1 }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) { if (counters(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature over a shingle array: for each (a, b) coefficient
  * pair, min over shingles of (hash28(shingle) * a + b) mod prime.
  * Returns array<long> of length coeffs.size; null for an empty array
  * (matching `array_min` of an empty transform = null per element — the
  * pipeline filters empty shingle sets before signing either way).
  */
case class MinHashSig(child: Expression, coeffs: Seq[(Long, Long)], prime: Long)
    extends StringArrayKernel {
  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // Empty input evals to null regardless of child nullability — without
  // this override a non-nullable child would make the expression claim
  // non-null while producing null (wrong-result/NPE hazard downstream).
  override def nullable: Boolean = true

  @transient private lazy val as = coeffs.map(_._1).toArray
  @transient private lazy val bs = coeffs.map(_._2).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) return null
    new GenericArrayData(TextHashKernels.minSig(arr, as, bs, prime))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** LSH band-bucket hashes from a shingle array in ONE kernel eval: the
  * minhash signature (as [[MinHashSig]]) grouped into bands of
  * `rowsPerBand`, each band keyed by the md5 hex of the comma-joined
  * decimal signature values — byte-identical to
  * `md5(concat_ws(",", sig_i...))` over [[MinHashSig]] outputs and to
  * the DuckDB oracle's `md5(sig0::VARCHAR || ',' || ...)`.
  *
  * Returning the band array from one expression matters beyond CPU: a
  * 16-column `element_at(sig, i)` projection over a CodegenFallback
  * kernel is NOT subexpression-eliminated (interpreted projections have
  * no CSE), so it would re-run the md5 loop 16x per row.
  */
case class MinHashBands(child: Expression, coeffs: Seq[(Long, Long)], prime: Long,
    rowsPerBand: Int) extends StringArrayKernel {
  require(rowsPerBand > 0 && coeffs.size % rowsPerBand == 0,
    s"coeffs.size=${coeffs.size} must be a positive multiple of rowsPerBand=$rowsPerBand " +
      "or trailing signature values would be silently dropped")

  override def prettyName: String = "minhash_bands"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  // See MinHashSig: empty input → null even for a non-nullable child.
  override def nullable: Boolean = true

  @transient private lazy val as = coeffs.map(_._1).toArray
  @transient private lazy val bs = coeffs.map(_._2).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) return null
    val mins = TextHashKernels.minSig(arr, as, bs, prime)
    val nBands = mins.length / rowsPerBand
    val out = new Array[AnyRef](nBands)
    val md = TextHashKernels.md5Digest() // thread-local; digest() resets
    var b = 0
    while (b < nBands) {
      val sb = new java.lang.StringBuilder(64)
      var r = 0
      while (r < rowsPerBand) {
        if (r > 0) sb.append(',')
        sb.append(mins(b * rowsPerBand + r))
        r += 1
      }
      out(b) = TextHashKernels.toHex(md.digest(sb.toString.getBytes("UTF-8")))
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

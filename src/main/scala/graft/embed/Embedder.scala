package graft.embed

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Text → fixed-dim embedding, as a per-partition batch transform.
  *
  * The reference runs transformers.js feature-extraction in a pool of
  * web workers with a per-worker pipeline cache
  * (`/root/reference/src/vector.ts:22-31`, `src/worker-scheduler.ts:5-26`).
  * In Spark the worker pool, round-robin scheduler and correlation ids
  * all dissolve into task parallelism: `repartition(n).mapPartitions`
  * with a lazily-initialized per-partition model instance is the same
  * execution shape (SURVEY §2.9 T9).
  *
  * There is no JVM transformers runtime in this environment, so the
  * shipped implementation is [[HashingEmbedder]] — a deterministic
  * seeded hash-projection embedder (FIXTURES.md §4): per-token seeded
  * hash → ±1 projection into `dims` → mean over tokens → L2 normalize.
  * That mirrors the reference's mean-pool + normalize post-processing
  * (`src/vector.ts:33-36`) and gives cross-JVM-stable vectors for
  * tests. A real model drops in behind the same trait.
  */
trait Embedder extends Serializable {
  def dims: Int

  /** Batch interface — implementations amortize model init across the
    * whole iterator (called once per partition).
    */
  def embed(texts: Iterator[String]): Iterator[Array[Float]]

  final def embedOne(text: String): Array[Float] = embed(Iterator(text)).next()
}

/** Deterministic seeded hash-projection embedder.
  *
  * token hash: murmur-ish 64-bit mix of (seed, token bytes); each token
  * contributes ±1 at `hash % dims` for `k` probes; document vector =
  * mean over tokens, L2-normalized. Same text ⇒ same vector, anywhere.
  */
final case class HashingEmbedder(dims: Int = 64, seed: Long = 42L, probes: Int = 4)
    extends Embedder {

  private def mix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33; h
  }

  private def tokenHash(token: String, probe: Int): Long = {
    var h = seed ^ (probe * 0x9e3779b97f4a7c15L)
    var i = 0
    while (i < token.length) { h = mix(h ^ token.charAt(i).toLong); i += 1 }
    h
  }

  def embed(texts: Iterator[String]): Iterator[Array[Float]] = texts.map { text =>
    val v = new Array[Float](dims)
    val toks = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
    var t = 0
    while (t < toks.length) {
      var p = 0
      while (p < probes) {
        val h = tokenHash(toks(t), p)
        val idx = java.lang.Math.floorMod(h, dims.toLong).toInt
        v(idx) += (if ((h >>> 62 & 1L) == 0L) 1f else -1f)
        p += 1
      }
      t += 1
    }
    if (toks.nonEmpty) { var i = 0; while (i < dims) { v(i) /= toks.length; i += 1 } }
    var norm = 0.0
    var i = 0
    while (i < dims) { norm += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(norm)
    if (n > 0) { i = 0; while (i < dims) { v(i) = (v(i) / n).toFloat; i += 1 } }
    v
  }
}

object Embedder {

  /** Append an `embedding` column by running `embedder` over `textCol`
    * with per-partition batching (the distributed analogue of the
    * reference's per-worker pipeline cache).
    */
  def embedText(df: DataFrame, textCol: String, embedder: Embedder,
      outCol: String = "embedding", batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(FloatType, containsNull = false), nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      // bounded chunks: an eager batch-inference embedder (the intended
      // real implementation) may drain its whole input iterator — with
      // an unbounded duplicate that would buffer the entire partition.
      // Per chunk we also insist on exactly one vector per row: a model
      // silently dropping rows must fail here, not truncate a zip.
      rows.grouped(batchSize).flatMap { chunk =>
        val vecs = embedder.embed(chunk.iterator.map(_.getString(idx))).toSeq
        require(vecs.size == chunk.size,
          s"embedder returned ${vecs.size} vectors for ${chunk.size} texts")
        chunk.iterator.zip(vecs.iterator).map { case (row, v) =>
          Row.fromSeq(row.toSeq :+ v.toSeq)
        }
      }
    }(enc)
  }
}

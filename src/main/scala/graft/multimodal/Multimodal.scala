package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal columns: images/audio/video as opaque `binary` columns
  * with typed sidecar metadata, plus the decode / feature-extract /
  * resize / frame-sample stages as per-partition batch transforms.
  *
  * The Spark-side plumbing here — schemas, batch shape, partitioning,
  * null/corrupt handling — is real and tested. For BMP and WAV the
  * DECODE is real too: [[MediaFormats.RealCodec]] parses the actual
  * binary format (header magic, stride/padding, RIFF chunk walk,
  * PCM16 frames) with no library dependency, and `q_m3_codec_meta`
  * oracle-checks the parsed fields end-to-end. Formats that need a
  * native library the container doesn't ship (JPEG, MP3, H.264)
  * remain stubbed (`StubCodec`: deterministic pseudo-features from
  * the byte stream); a real implementation replaces `MediaCodec`
  * only — every pipeline around it is unchanged.
  *
  * Scale design: media bytes never pass through a shuffle — all stages
  * are per-row/per-partition maps over the scan, and feature outputs
  * (small fixed-size vectors + scalars) are what downstream joins/aggs
  * consume. Decoding is batched per partition so a real codec can
  * amortize native init, mirroring graft.embed.Embedder.
  */
object Multimodal {

  /** Asset table schema: opaque bytes + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("media", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Decoded-frame feature schema appended by [[extractFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = true)))

  /** Codec boundary — the ONLY stubbed piece. */
  trait MediaCodec extends Serializable {
    /** Decode + featurize one asset's bytes; None = corrupt/undecodable. */
    def featurize(kind: String, bytes: Array[Byte], dims: Int): Option[Array[Float]]
  }

  /** STUB codec: deterministic pseudo-features from the byte stream
    * (a real codec — JPEG decode, mel-spectrogram, frame sampling —
    * replaces exactly this class).
    */
  object StubCodec extends MediaCodec {
    def featurize(kind: String, bytes: Array[Byte], dims: Int): Option[Array[Float]] = {
      if (bytes == null || bytes.isEmpty) return None
      val v = new Array[Float](dims)
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) {
        h = 31 * h + bytes(i)
        v(java.lang.Math.floorMod(h, dims.toLong).toInt) += 1f
        i += 1
      }
      var norm = 0.0; i = 0
      while (i < dims) { norm += v(i).toDouble * v(i); i += 1 }
      val n = math.sqrt(norm)
      if (n > 0) { i = 0; while (i < dims) { v(i) = (v(i) / n).toFloat; i += 1 } }
      Some(v)
    }
  }

  /** Decode + feature-extract stage: per-partition batch map appending
    * `(ok, n_bytes, feature)`; corrupt assets yield ok=false rows
    * instead of failing the task (at 100 TB some assets are always
    * corrupt — the pipeline must degrade per-row, not per-job).
    */
  def extractFeatures(assets: DataFrame, codec: MediaCodec = StubCodec,
      dims: Int = 32): DataFrame = {
    val outSchema = StructType(assets.schema.fields ++ featureSchema.fields)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val kindIdx = assets.schema.fieldIndex("kind")
    val mediaIdx = assets.schema.fieldIndex("media")
    assets.mapPartitions { rows =>
      rows.map { row =>
        val bytes = if (row.isNullAt(mediaIdx)) null else row.getAs[Array[Byte]](mediaIdx)
        val feat = codec.featurize(row.getString(kindIdx), bytes, dims)
        Row.fromSeq(row.toSeq ++ Seq(
          feat.isDefined,
          if (bytes == null) 0L else bytes.length.toLong,
          feat.map(_.toSeq).orNull))
      }
    }(enc)
  }

  /** Uniform-stride frame sampling: split the opaque media bytes into
    * fixed-size frames and emit up to `maxFrames` of them, evenly
    * spaced (index floor(j·n/k), strictly increasing since n ≥ k) —
    * the video-pipeline pass that bounds per-asset downstream cost no
    * matter how long the asset is. Pure columnar (sequence + explode +
    * binary substring — no codec, stays in codegen), one row per
    * sampled frame carrying the frame bytes for a downstream
    * [[extractFeatures]]. Media bytes still never cross a shuffle: the
    * fan-out is a per-row Generate over the scan. A real video codec
    * replaces byte-ranges with decoded frames at the same geometry.
    */
  def frameSample(assets: DataFrame, frameBytes: Int, maxFrames: Int): DataFrame =
    assets
      .withColumn("n_frames", (length(col("media")) / frameBytes).cast("long"))
      .filter(col("n_frames") >= 1)
      .withColumn("k", least(lit(maxFrames.toLong), col("n_frames")))
      .select(col("*"), explode(sequence(lit(0L), col("k") - 1)).as("j"))
      .withColumn("frame_idx", expr("(j * n_frames) DIV k"))
      .withColumn("frame",
        expr(s"substring(media, CAST(frame_idx * $frameBytes + 1 AS INT), $frameBytes)"))
      .drop("j", "k")

  /** Resize stage: per-row nearest-neighbor BMP resample
    * ([[MediaFormats.resizeBmp]]), appending `(resize_ok, resized)` —
    * the standard normalize-before-featurize pass of an image
    * pipeline. Non-BMP, corrupt, and null assets degrade per-row
    * (resize_ok=false, resized null), never per-task. Same scale shape
    * as the other stages: a narrow map over the scan, media bytes
    * never cross a shuffle, and the resized payload is strictly
    * smaller than the source for downscales.
    */
  def resizeImages(assets: DataFrame, dstW: Int, dstH: Int): DataFrame = {
    val outSchema = StructType(assets.schema.fields ++ Seq(
      StructField("resize_ok", BooleanType, nullable = false),
      StructField("resized", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val mediaIdx = assets.schema.fieldIndex("media")
    assets.mapPartitions { rows =>
      rows.map { row =>
        val bytes = if (row.isNullAt(mediaIdx)) null else row.getAs[Array[Byte]](mediaIdx)
        val rb = MediaFormats.resizeBmp(bytes, dstW, dstH)
        Row.fromSeq(row.toSeq ++ Seq(rb.isDefined, rb.orNull))
      }
    }(enc)
  }

  /** Metadata-level operators need no codec at all — pure columnar. */
  def metadataStats(assets: DataFrame): DataFrame =
    assets.groupBy("kind").agg(
      count(lit(1)).as("n"),
      sum(when(col("media").isNull, 1L).otherwise(0L)).as("n_missing"),
      round(avg(length(col("media"))), 2).as("avg_bytes"),
      round(avg(col("meta.width")), 2).as("avg_width"))
      .orderBy("kind")
}

package graft.multimodal

/** Dependency-free binary codecs for the two classic header-described
  * media formats: BMP (24bpp uncompressed BI_RGB) and WAV (RIFF PCM16).
  * Both are pure byte arithmetic — no image/audio library — which makes
  * every decoded field (dimensions, channel count, sample rate,
  * duration, payload sums) ORACLE-CHECKABLE: DuckDB can predict the
  * exact answer for a deterministically generated asset without ever
  * seeing the bytes, while the Spark side must actually parse them
  * (`q_m3_codec_meta`). This is the first NON-stub decode in the
  * multimodal family — the analogue of the reference running its one
  * real-bytes stage, embedding inference on actual model weights
  * (`/root/reference/src/vector.ts:22-37`), rather than a stand-in.
  *
  * Decoders return None on ANY malformation (bad magic, truncated
  * header, out-of-bounds pixel/data array, unsupported bpp/codec) —
  * the per-row degradation contract [[Multimodal.extractFeatures]]
  * requires at 100 TB, where some fraction of assets is always
  * corrupt. Encoders exist for fixture generation and round-trip
  * testing; production ingest reads real files.
  *
  * Scale shape: a decode is a single forward pass over one asset's
  * bytes inside a narrow map over the scan — media bytes never cross a
  * shuffle, and only the small decoded scalars flow downstream.
  */
object MediaFormats {

  final case class BmpMeta(width: Int, height: Int, pxSum: Long)
  final case class WavMeta(channels: Int, sampleRate: Int, nFrames: Long,
    durationMs: Long, ampSum: Long)

  // ------------------------------------------------------- LE helpers

  private def w16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def w32(b: Array[Byte], off: Int, v: Long): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
  }
  private def r16u(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def r16s(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) | (b(off + 1) << 8)).toShort.toInt
  private def r32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def r32i(b: Array[Byte], off: Int): Int = r32(b, off).toInt

  // -------------------------------------------------------------- BMP

  /** Row stride: pixel rows pad to a 4-byte boundary (the format's
    * word-alignment rule — the part a naive 3·width reader gets wrong).
    */
  private def bmpStride(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** 24bpp bottom-up BMP whose pixel DATA bytes (padding excluded) take
    * the deterministic value `(seed + p) % 256` at flat data index `p`
    * — so `Σ pixel bytes` is predictable arithmetic for any (seed,
    * width, height), which is what the m3 oracle exploits.
    */
  def encodeBmp(seed: Long, width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val stride = bmpStride(width)
    val size = 54 + stride * height
    val b = new Array[Byte](size)
    b(0) = 'B'; b(1) = 'M'
    w32(b, 2, size.toLong); w32(b, 10, 54L)
    w32(b, 14, 40L); w32(b, 18, width.toLong); w32(b, 22, height.toLong)
    w16(b, 26, 1); w16(b, 28, 24); w32(b, 30, 0L)
    w32(b, 34, (stride * height).toLong)
    w32(b, 38, 2835L); w32(b, 42, 2835L)
    var p = 0L
    var y = 0
    while (y < height) {
      val rowOff = 54 + y * stride
      var i = 0
      while (i < 3 * width) {
        b(rowOff + i) = (((seed + p) % 256 + 256) % 256).toByte
        p += 1; i += 1
      }
      y += 1 // pad bytes stay zero
    }
    b
  }

  /** Validated 24bpp BI_RGB header: (width, |height|, topDown,
    * dataOffset, stride) — shared by decode and resize.
    */
  private def bmpHeader(b: Array[Byte]): Option[(Int, Int, Boolean, Int, Int)] = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOffset = r32(b, 10)
    if (r32(b, 14) < 40) return None // BITMAPINFOHEADER or later
    val width = r32i(b, 18)
    val rawH = r32i(b, 22)
    val height = math.abs(rawH)
    if (width <= 0 || height <= 0 || r16u(b, 26) != 1) return None
    if (r16u(b, 28) != 24 || r32(b, 30) != 0) return None // 24bpp BI_RGB only
    val stride = bmpStride(width)
    if (dataOffset < 54 || dataOffset + stride.toLong * height > b.length) return None
    Some((width, height, rawH < 0, dataOffset.toInt, stride))
  }

  /** Parse header + sum the pixel DATA bytes (unsigned, padding
    * skipped, stride honored; negative height = top-down storage is
    * accepted — sums are order-independent). None on any malformation.
    */
  def decodeBmp(b: Array[Byte]): Option[BmpMeta] = bmpHeader(b).map {
    case (width, height, _, dataOffset, stride) =>
      var sum = 0L
      var y = 0
      while (y < height) {
        val rowOff = dataOffset + y * stride
        var i = 0
        while (i < 3 * width) { sum += (b(rowOff + i) & 0xff); i += 1 }
        y += 1
      }
      BmpMeta(width, height, sum)
  }

  /** Nearest-neighbor BMP resample: destination IMAGE pixel (ix, iy)
    * takes source image pixel (⌊ix·sw/dw⌋, ⌊iy·sh/dh⌋). Sampling is in
    * image coordinates — bottom-up sources index storage row
    * `h−1−iy`, top-down sources index row `iy` — and the output is
    * always canonical bottom-up with its own stride padding, so a
    * resize can CHANGE the padding geometry (e.g. 4→2 wide: stride 12
    * → 8) and the result is a fully valid BMP that [[decodeBmp]] round
    * -trips. None on malformed input or non-positive target dims.
    */
  def resizeBmp(b: Array[Byte], dstW: Int, dstH: Int): Option[Array[Byte]] =
    bmpHeader(b).filter(_ => dstW > 0 && dstH > 0).map {
      case (sw, sh, topDown, dataOffset, srcStride) =>
        val stride = bmpStride(dstW)
        val size = 54 + stride * dstH
        val out = new Array[Byte](size)
        out(0) = 'B'; out(1) = 'M'
        w32(out, 2, size.toLong); w32(out, 10, 54L)
        w32(out, 14, 40L); w32(out, 18, dstW.toLong); w32(out, 22, dstH.toLong)
        w16(out, 26, 1); w16(out, 28, 24); w32(out, 30, 0L)
        w32(out, 34, (stride * dstH).toLong)
        w32(out, 38, 2835L); w32(out, 42, 2835L)
        var iy = 0
        while (iy < dstH) {
          val sy = iy.toLong * sh / dstH
          val srcRow = dataOffset +
            (if (topDown) sy else sh - 1 - sy).toInt * srcStride
          val dstRow = 54 + (dstH - 1 - iy) * stride // bottom-up output
          var ix = 0
          while (ix < dstW) {
            val sx = (ix.toLong * sw / dstW).toInt
            out(dstRow + 3 * ix) = b(srcRow + 3 * sx)
            out(dstRow + 3 * ix + 1) = b(srcRow + 3 * sx + 1)
            out(dstRow + 3 * ix + 2) = b(srcRow + 3 * sx + 2)
            ix += 1
          }
          iy += 1
        }
        out
    }

  // -------------------------------------------------------------- WAV

  /** RIFF/WAVE PCM16 whose interleaved samples take the deterministic
    * value `(seed + i) % 512 − 256` at flat sample index `i` (so
    * `Σ |sample|` is predictable arithmetic). `junkChunk` inserts a
    * 4-byte LIST chunk before `data`, forcing decoders to walk chunks
    * rather than assume the canonical 44-byte layout.
    */
  def encodeWav(seed: Long, channels: Int, sampleRate: Int, nFrames: Int,
      junkChunk: Boolean = false): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && nFrames >= 0)
    val dataSize = nFrames * channels * 2
    val junk = if (junkChunk) 12 else 0
    val size = 44 + junk + dataSize
    val b = new Array[Byte](size)
    b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
    w32(b, 4, (size - 8).toLong)
    b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
    b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
    w32(b, 16, 16L)
    w16(b, 20, 1); w16(b, 22, channels)
    w32(b, 24, sampleRate.toLong); w32(b, 28, (sampleRate * channels * 2).toLong)
    w16(b, 32, channels * 2); w16(b, 34, 16)
    var off = 36
    if (junkChunk) {
      b(off) = 'L'; b(off + 1) = 'I'; b(off + 2) = 'S'; b(off + 3) = 'T'
      w32(b, off + 4, 4L)
      b(off + 8) = 'I'; b(off + 9) = 'N'; b(off + 10) = 'F'; b(off + 11) = 'O'
      off += 12
    }
    b(off) = 'd'; b(off + 1) = 'a'; b(off + 2) = 't'; b(off + 3) = 'a'
    w32(b, off + 4, dataSize.toLong)
    var i = 0L
    var p = off + 8
    while (p < size) {
      val v = (((seed + i) % 512 + 512) % 512 - 256).toInt
      w16(b, p, v & 0xffff)
      i += 1; p += 2
    }
    b
  }

  /** Walk the RIFF chunk list (word-aligned: odd-size chunks carry a
    * pad byte), parse `fmt `, locate `data`, and sum |sample| over the
    * PCM16 stream. None on any malformation or non-PCM16 content.
    */
  def decodeWav(b: Array[Byte]): Option[WavMeta] = {
    if (b == null || b.length < 44) return None
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var off = 12
    var channels = -1; var rate = -1; var blockAlign = -1
    var dataOff = -1; var dataSize = -1L
    while (off + 8 <= b.length) {
      val id = new String(b, off, 4, "US-ASCII")
      val size = r32(b, off + 4)
      val body = off + 8
      if (body + size > b.length) return None
      if (id == "fmt ") {
        if (size < 16) return None
        if (r16u(b, body) != 1 || r16u(b, body + 14) != 16) return None // PCM16 only
        channels = r16u(b, body + 2)
        rate = r32i(b, body + 4)
        blockAlign = r16u(b, body + 12)
      } else if (id == "data") {
        // Duplicate `data` chunks are malformed and AMBIGUOUS: reject
        // rather than pick one, so every consumer (decode, resample)
        // agrees by construction on which bytes are the stream.
        if (dataOff >= 0) return None
        dataOff = body; dataSize = size
      }
      off = body + size.toInt + (size.toInt & 1) // odd chunks pad to even
    }
    if (channels <= 0 || rate <= 0 || blockAlign != channels * 2 ||
      dataOff < 0 || dataSize % 2 != 0) return None
    val nFrames = dataSize / blockAlign
    var sum = 0L
    var p = dataOff
    val end = dataOff + dataSize.toInt
    while (p < end) { sum += math.abs(r16s(b, p)); p += 2 }
    Some(WavMeta(channels, rate, nFrames, nFrames * 1000L / rate, sum))
  }

  /** Nearest-neighbor PCM16 resample to `dstRate`: destination frame
    * `j` takes source frame `⌊j·srcFrames/dstFrames⌋` (all channels),
    * with `dstFrames = ⌊srcFrames·dstRate/srcRate⌋` so wall-clock
    * duration is preserved up to one frame — the normalize-sample-rate
    * pass an audio training pipeline runs before featurization. The
    * output is a canonical 44-byte-header WAV (foreign chunks from the
    * source are parsed, then dropped) that [[decodeWav]] round-trips.
    * None on malformed input, non-PCM16 content, or a non-positive
    * target rate. Upsampling repeats frames (nearest), downsampling
    * decimates; both are pure index arithmetic — oracle-predictable.
    */
  def resampleWav(b: Array[Byte], dstRate: Int): Option[Array[Byte]] = {
    if (dstRate <= 0) return None
    decodeWav(b).map { m =>
      // re-locate the data chunk (decodeWav validated the walk)
      var off = 12
      var dataOff = -1; var dataSize = -1L
      while (off + 8 <= b.length && dataOff < 0) {
        val id = new String(b, off, 4, "US-ASCII")
        val size = r32(b, off + 4)
        if (id == "data") { dataOff = off + 8; dataSize = size }
        off = off + 8 + size.toInt + (size.toInt & 1)
      }
      val srcFrames = m.nFrames
      val dstFrames = srcFrames * dstRate / m.sampleRate
      val ch = m.channels
      val dataBytes = (dstFrames * ch * 2).toInt
      val out = new Array[Byte](44 + dataBytes)
      out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
      w32(out, 4, (out.length - 8).toLong)
      out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
      out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
      w32(out, 16, 16L)
      w16(out, 20, 1); w16(out, 22, ch)
      w32(out, 24, dstRate.toLong); w32(out, 28, (dstRate * ch * 2).toLong)
      w16(out, 32, ch * 2); w16(out, 34, 16)
      out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
      w32(out, 40, dataBytes.toLong)
      var j = 0L
      while (j < dstFrames) {
        val sj = j * srcFrames / dstFrames
        val srcP = dataOff + (sj * ch * 2).toInt
        val dstP = 44 + (j * ch * 2).toInt
        var c = 0
        while (c < 2 * ch) { out(dstP + c) = b(srcP + c); c += 1 }
        j += 1
      }
      out
    }
  }

  /** Real [[Multimodal.MediaCodec]]: dispatches on magic bytes, decodes
    * with the parsers above, and featurizes from the DECODED content —
    * geometry + normalized mean payload level — rather than from a
    * hash of the raw stream. Unknown formats and malformed assets are
    * None (corrupt), never silently stubbed.
    */
  object RealCodec extends Multimodal.MediaCodec {
    def featurize(kind: String, bytes: Array[Byte], dims: Int): Option[Array[Float]] = {
      if (bytes == null || bytes.length < 4 || dims < 4) return None
      val v = new Array[Float](dims)
      if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes).map { m =>
        v(0) = m.width.toFloat
        v(1) = m.height.toFloat
        v(2) = (m.pxSum.toDouble / (3.0 * m.width * m.height) / 255.0).toFloat
        v(3) = m.width.toFloat / m.height
        v
      } else if (bytes(0) == 'R' && bytes(1) == 'I') decodeWav(bytes).map { m =>
        v(0) = m.channels.toFloat
        v(1) = m.sampleRate.toFloat / 1000f
        v(2) = m.durationMs.toFloat / 1000f
        v(3) = if (m.nFrames > 0)
          (m.ampSum.toDouble / (m.nFrames * m.channels) / 256.0).toFloat else 0f
        v
      } else None
    }
  }
}

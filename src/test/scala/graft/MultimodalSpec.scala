package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {

  private def assets = {
    val rows = Seq(
      Row(1L, "image", "fakejpegbytes-one".getBytes("UTF-8"), "image/jpeg", Row(640, 480, null)),
      Row(2L, "image", "fakejpegbytes-two".getBytes("UTF-8"), "image/jpeg", Row(800, 600, null)),
      Row(3L, "audio", "fakewavbytes".getBytes("UTF-8"), "audio/wav", Row(null, null, 1500L)),
      Row(4L, "image", null, null, Row(null, null, null)) // corrupt/missing
    )
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.assetSchema)
  }

  test("feature extraction: per-row degradation, deterministic features") {
    val out = Multimodal.extractFeatures(assets, dims = 32).cache()
    assert(out.count() === 4)
    assert(out.filter(col("ok")).count() === 3)
    val corrupt = out.filter(col("asset_id") === 4).head()
    assert(!corrupt.getAs[Boolean]("ok"))
    assert(corrupt.getAs[Long]("n_bytes") === 0L)
    assert(corrupt.isNullAt(out.columns.indexOf("feature")))
    // deterministic: two runs agree
    val f1 = out.filter(col("asset_id") === 1).select("feature").head().getSeq[Float](0)
    val f2 = Multimodal.extractFeatures(assets, dims = 32)
      .filter(col("asset_id") === 1).select("feature").head().getSeq[Float](0)
    assert(f1 === f2)
    assert(f1.size === 32)
    // features are L2-normalized
    assert(math.abs(f1.map(x => x.toDouble * x).sum - 1.0) < 1e-5)
  }

  test("metadata stats need no codec") {
    val stats = Multimodal.metadataStats(assets).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats === Map("audio" -> 1L, "image" -> 3L))
  }

  // ---------------------------------------------- real codec (BMP/WAV)

  test("BMP round-trip: stride padding honored, top-down accepted, sums exact") {
    import graft.multimodal.MediaFormats
    // w=3 → row stride 12 (3 pad bytes/row), w=5 → stride 16 (1 pad byte):
    // a decoder that sums the raw pixel array including padding, or
    // assumes stride = 3w, gets a different sum
    for ((w, h, seed) <- Seq((3, 4, 7L), (5, 3, 11L), (4, 2, 0L), (16, 4, 999L))) {
      val b = MediaFormats.encodeBmp(seed, w, h)
      val expected = (0L until 3L * w * h).map(p => (seed + p) % 256).sum
      val m = MediaFormats.decodeBmp(b)
      assert(m.contains(MediaFormats.BmpMeta(w, h, expected)),
        s"w=$w h=$h: got $m, want pxSum=$expected")
    }
    // top-down storage (negative height in the header) decodes too —
    // same dims, same order-independent sum
    val b = MediaFormats.encodeBmp(5L, 3, 4)
    val neg = b.clone()
    val hBytes = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-4).array()
    System.arraycopy(hBytes, 0, neg, 22, 4)
    assert(MediaFormats.decodeBmp(neg) === MediaFormats.decodeBmp(b))
  }

  test("WAV round-trip: chunk walk, odd-size chunk padding, PCM16 sums exact") {
    import graft.multimodal.MediaFormats
    for ((ch, rate, nf, seed, junk) <- Seq(
      (1, 8000, 40, 3L, false), (2, 16000, 99, 17L, true), (2, 24000, 1, 0L, false))) {
      val b = MediaFormats.encodeWav(seed, ch, rate, nf, junk)
      val expected = (0L until nf.toLong * ch)
        .map(i => math.abs((seed + i) % 512 - 256)).sum
      val m = MediaFormats.decodeWav(b)
      assert(m.contains(MediaFormats.WavMeta(ch, rate, nf.toLong,
        nf.toLong * 1000 / rate, expected)), s"ch=$ch rate=$rate nf=$nf: got $m")
    }
    // an odd-size foreign chunk carries a pad byte (RIFF word alignment)
    // — a walker that forgets the pad misreads every later chunk id
    val base = MediaFormats.encodeWav(9L, 1, 8000, 10, junkChunk = false)
    val spliced = new Array[Byte](base.length + 12) // "ODD\0" + size 3 + 3 data + 1 pad
    System.arraycopy(base, 0, spliced, 0, 36)
    val odd = Array[Byte]('O', 'D', 'D', ' ', 3, 0, 0, 0, 1, 2, 3, 0)
    System.arraycopy(odd, 0, spliced, 36, 12)
    System.arraycopy(base, 36, spliced, 48, base.length - 36)
    // fix the RIFF size field
    val sz = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(spliced.length - 8).array()
    System.arraycopy(sz, 0, spliced, 4, 4)
    assert(MediaFormats.decodeWav(spliced) === MediaFormats.decodeWav(base))
    // DUPLICATE data chunks are ambiguous (which bytes are the stream?)
    // — both the decode walk and the resample walk must agree, so the
    // format layer rejects the file outright instead of letting the
    // two consumers pick different chunks
    val twoData = new Array[Byte](base.length + 12)
    System.arraycopy(base, 0, twoData, 0, base.length)
    val extra = Array[Byte]('d', 'a', 't', 'a', 4, 0, 0, 0, 1, 2, 3, 4)
    System.arraycopy(extra, 0, twoData, base.length, 12)
    val sz2 = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(twoData.length - 8).array()
    System.arraycopy(sz2, 0, twoData, 4, 4)
    assert(MediaFormats.decodeWav(twoData).isEmpty)
    assert(MediaFormats.resampleWav(twoData, 8000).isEmpty)
  }

  test("resize: exact nearest-neighbor pixels, padding geometry change, round-trip") {
    import graft.multimodal.MediaFormats
    // 2x2 source, seed 0 → data byte values = flat index p. Downscale
    // to 1x1: the single dst image pixel samples src IMAGE (0,0) =
    // bottom-up STORAGE row 1 → bytes p=6,7,8 (storage row stride 8:
    // row 0 holds p=0..5 + 2 pad)
    val src = MediaFormats.encodeBmp(0L, 2, 2)
    val r1 = MediaFormats.resizeBmp(src, 1, 1).get
    assert(MediaFormats.decodeBmp(r1).contains(MediaFormats.BmpMeta(1, 1, 6L + 7 + 8)),
      "1x1 resample must take the image-origin pixel, not the storage-origin one")
    // top-down source with identical image content resamples identically
    val td = src.clone()
    val hb = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-2).array()
    System.arraycopy(hb, 0, td, 22, 4)
    // (negating the height flips image orientation, so the sampled
    // origin pixel becomes storage row 0 → bytes 0,1,2)
    assert(MediaFormats.decodeBmp(MediaFormats.resizeBmp(td, 1, 1).get)
      .contains(MediaFormats.BmpMeta(1, 1, 0L + 1 + 2)))
    // stride geometry changes across the resize: 4-wide (stride 12, no
    // pad) → 2-wide (stride 8, 2 pad bytes/row); result stays a valid
    // round-trippable BMP of the predicted size
    val wide = MediaFormats.encodeBmp(5L, 4, 4)
    val r2 = MediaFormats.resizeBmp(wide, 2, 2).get
    assert(r2.length === 54 + 8 * 2)
    assert(MediaFormats.decodeBmp(r2).exists(m => m.width == 2 && m.height == 2))
    // malformed input and bad targets are None, never a throw
    assert(MediaFormats.resizeBmp(java.util.Arrays.copyOf(wide, 20), 2, 2).isEmpty)
    assert(MediaFormats.resizeBmp(wide, 0, 2).isEmpty)
    assert(MediaFormats.resizeBmp(null, 1, 1).isEmpty)
  }

  test("resizeImages stage degrades per-row; resized output feeds extractFeatures") {
    import graft.multimodal.MediaFormats
    val rows = Seq(
      Row(1L, "image", MediaFormats.encodeBmp(3L, 8, 4), "image/bmp", Row(8, 4, null)),
      Row(2L, "image", "garbage".getBytes("UTF-8"), "image/bmp", Row(null, null, null)),
      Row(3L, "image", null, null, Row(null, null, null)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.assetSchema)
    val resized = Multimodal.resizeImages(df, 4, 2)
    val byId = resized.select("asset_id", "resize_ok", "resized").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getAs[Array[Byte]](2))).toMap
    assert(byId(1L)._1 && !byId(2L)._1 && !byId(3L)._1)
    assert(byId(2L)._2 == null && byId(3L)._2 == null)
    // the resized payload is a decodable BMP of the target geometry and
    // chains into the real-codec featurizer
    assert(MediaFormats.decodeBmp(byId(1L)._2).exists(m => m.width == 4 && m.height == 2))
    val feat = Multimodal.extractFeatures(
      resized.drop("media").withColumnRenamed("resized", "media"),
      codec = MediaFormats.RealCodec, dims = 8)
      .select("asset_id", "ok", "feature").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(feat === Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("resample: exact decimation, identity, upsample, chunk-walk, degenerate") {
    import graft.multimodal.MediaFormats
    // 2:1 downsample keeps every even source frame: seed 0, mono →
    // sample values = flat index % 512 - 256; kept frames 0,2,4,...
    val src = MediaFormats.encodeWav(0L, 1, 16000, 10)
    val down = MediaFormats.resampleWav(src, 8000).get
    val expect = (0 until 5).map(j => math.abs((2 * j) % 512 - 256).toLong).sum
    assert(MediaFormats.decodeWav(down).contains(
      MediaFormats.WavMeta(1, 8000, 5L, 5L * 1000 / 8000, expect)))
    // identity resample preserves every sample
    val same = MediaFormats.resampleWav(src, 16000).get
    assert(MediaFormats.decodeWav(same).map(m => (m.nFrames, m.ampSum)) ===
      MediaFormats.decodeWav(src).map(m => (m.nFrames, m.ampSum)))
    // 2x upsample repeats frames (nearest): each source sample twice
    val up = MediaFormats.resampleWav(src, 32000).get
    val srcSum = MediaFormats.decodeWav(src).get.ampSum
    assert(MediaFormats.decodeWav(up).exists(m =>
      m.nFrames == 20L && m.ampSum == 2 * srcSum))
    // a junk-chunk source is chunk-walked; the resampled output is
    // canonical (44-byte header, foreign chunks dropped)
    val junky = MediaFormats.encodeWav(7L, 2, 24000, 9, junkChunk = true)
    val rj = MediaFormats.resampleWav(junky, 8000).get
    assert(rj.length === 44 + 3 * 2 * 2, "9 frames @24k -> 3 @8k, stereo PCM16")
    assert(MediaFormats.decodeWav(rj).exists(m => m.sampleRate == 8000 && m.nFrames == 3L))
    // degenerate: heavier downsample than frames available → empty but
    // valid audio; corrupt input and bad targets are None
    assert(MediaFormats.decodeWav(
      MediaFormats.resampleWav(MediaFormats.encodeWav(1L, 1, 24000, 2), 8000).get)
      .exists(_.nFrames == 0L))
    assert(MediaFormats.resampleWav(java.util.Arrays.copyOf(src, 20), 8000).isEmpty)
    assert(MediaFormats.resampleWav(src, 0).isEmpty)
  }

  test("real codec degrades per-row on corrupt real-format assets") {
    import graft.multimodal.MediaFormats
    val okBmp = MediaFormats.encodeBmp(1L, 4, 2)
    val okWav = MediaFormats.encodeWav(2L, 2, 8000, 40)
    val rows = Seq(
      Row(1L, "image", okBmp, "image/bmp", Row(4, 2, null)),
      Row(2L, "audio", okWav, "audio/wav", Row(null, null, 5L)),
      Row(3L, "image", java.util.Arrays.copyOf(okBmp, 10), "image/bmp",
        Row(null, null, null)),                     // truncated header
      Row(4L, "image", "notanimageatall".getBytes("UTF-8"), "image/bmp",
        Row(null, null, null)),                     // wrong magic
      Row(5L, "audio", java.util.Arrays.copyOf(okWav, 40), "audio/wav",
        Row(null, null, null)),                     // truncated chunk list
      Row(6L, "image", null, null, Row(null, null, null)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.assetSchema)
    val out = Multimodal.extractFeatures(df, codec = MediaFormats.RealCodec, dims = 8)
      .select("asset_id", "ok", "feature").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), if (r.isNullAt(2)) null else r.getSeq[Float](2)))
      .toMap
    assert(out(1)._1 && out(2)._1, "well-formed assets decode")
    assert(!out(3)._1 && !out(4)._1 && !out(5)._1 && !out(6)._1,
      "corrupt assets degrade to ok=false, not task failure")
    assert(out(3)._2 == null && out(6)._2 == null)
    // features come from the DECODED content: geometry in the lead slots
    assert(out(1)._2(0) === 4f && out(1)._2(1) === 2f, "BMP features = width, height")
    assert(out(2)._2(0) === 2f && out(2)._2(1) === 8f, "WAV features = channels, kHz")
    assert(out(2)._2(2) === 0.005f, "WAV duration: 40 frames / 8000 Hz = 5 ms")
  }

  test("frame sampling: uniform stride, exact byte ranges, bounded fan-out") {
    // 1000-byte "video" = 100 frames of 10 bytes; 25-byte one = 2 frames;
    // 5-byte one = 0 frames (dropped); null media dropped
    val bytes1000 = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
    val rows = Seq(
      Row(10L, "video", bytes1000, "video/mp4", Row(null, null, 40000L)),
      Row(11L, "video", Array.tabulate[Byte](25)(_.toByte), "video/mp4", Row(null, null, 1000L)),
      Row(12L, "video", Array.tabulate[Byte](5)(_.toByte), "video/mp4", Row(null, null, 200L)),
      Row(13L, "video", null, null, Row(null, null, null)))
    val vids = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.assetSchema)

    val out = Multimodal.frameSample(vids, frameBytes = 10, maxFrames = 4)
      .select("asset_id", "n_frames", "frame_idx", "frame")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getAs[Array[Byte]](3)))

    // asset 10: k=4 of 100 frames at idx 0,25,50,75; asset 11: both frames
    assert(out.map(t => (t._1, t._3)).sorted.toSeq ==
      Seq((10L, 0L), (10L, 25L), (10L, 50L), (10L, 75L), (11L, 0L), (11L, 1L)))
    out.filter(_._1 == 10L).foreach { case (_, nf, idx, frame) =>
      assert(nf == 100L)
      assert(frame.toSeq == bytes1000.slice(idx.toInt * 10, idx.toInt * 10 + 10).toSeq,
        s"frame $idx must be the exact byte range")
    }
  }
}

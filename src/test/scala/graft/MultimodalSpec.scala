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

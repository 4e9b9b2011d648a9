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
}

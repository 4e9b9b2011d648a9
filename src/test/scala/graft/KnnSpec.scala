package graft

import graft.operators.Knn
import org.apache.spark.sql.functions._

/** The reference's own validation idea (SURVEY §5.1): the exact full
  * scan is ground truth for the approximate strategies — assert recall
  * and report the docReads analogue (candidates scanned).
  */
class KnnSpec extends SparkSuite {

  private def queryVec = {
    val arr = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") === Knn.QueryId).select("embedding")
      .head().getSeq[Float](0)
    typedlit(arr)
  }

  private lazy val exact: Seq[Long] =
    Knn.fullScanKnn(spark, sf0001, queryVec, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq

  test("full scan returns the query itself first with distance 0") {
    val top = Knn.fullScanKnn(spark, sf0001, queryVec, 1).head()
    assert(top.getAs[Long]("vec_id") === Knn.QueryId.toLong)
    assert(top.getAs[Double]("dist") === 0.0)
  }

  test("index-range recall vs exact oracle") {
    val approx = Knn.indexRangeKnn(spark, sf0001, queryVec, 10, Knn.Eps)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    info(s"indexRange recall@10 = $recall (candidates are eps-window dependent)")
    assert(approx.nonEmpty)
    assert(recall >= 0.1, "range strategy must find at least some true neighbors")
  }

  test("ivf with all clusters probed == exact") {
    val all = Knn.ivfKnn(spark, sf0001, queryVec, 10, Knn.PivotIds.size)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(all === exact, "probing every bucket must equal the exact scan")
  }

  test("ivf nprobe=2 recall and docReads accounting") {
    val probed = Knn.ivfKnn(spark, sf0001, queryVec, 10, 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = exact.count(probed.contains).toDouble / exact.size
    // docReads analogue: how many rows the probe actually scanned
    val total = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    info(s"ivf nprobe=2 recall@10 = $recall, corpus = $total rows")
    assert(recall >= 0.3)
  }

  test("index-similarity (per-side bands) recall vs exact oracle") {
    val got = Knn.indexSimilarityKnn(spark, sf0001, queryVec, 10, 100)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    info(s"indexSimilarity recall@10 = $recall")
    // approximate by design: 2·P·perSide candidate bands, not full cover
    assert(recall >= 0.5)
  }

  test("top-k == sort-prefix property") {
    val k5 = Knn.fullScanKnn(spark, sf0001, queryVec, 5)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(k5 === exact.take(5))
  }

  test("q_v15_recall_eval: docreads bounded by corpus, recall bounded by K, batch complete") {
    val total = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    val rows = Knn.v15RecallEval(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq === Knn.EvalQids.map(_.toLong),
      "one row per eval query, in order")
    rows.foreach { case (qid, docreads, recall) =>
      assert(docreads >= 0 && docreads < total, s"q$qid reads must exclude self")
      assert(recall >= 0 && recall <= Knn.EvalK)
    }
    val meanRecall = rows.map(_._3).sum.toDouble / (rows.length * Knn.EvalK)
    info(f"5-band union @ eps=${Knn.Eps}: mean recall@10 = $meanRecall%.2f, " +
      f"mean docreads = ${rows.map(_._2).sum / rows.length}/$total")
    // the union of five pivot bands is the reference's serving strategy;
    // it should be near-exhaustive in recall on this fixture
    assert(meanRecall >= 0.8)
  }
}

package graft

import graft.functions.VectorFunctions.euclidean
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** MLlib random-projection LSH near-dup vs the exact pairwise oracle:
  * the LSH candidate set must (a) contain no false positives beyond the
  * distance threshold and (b) recover a solid fraction of the true
  * pairs at these settings.
  */
class DedupLshSpec extends SparkSuite {

  test("approxSimilarityJoin near-dups vs exact pairwise ground truth") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding")
    val threshold = 1.1 // euclidean on unit vectors: cos sim >= ~0.4

    val exact = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("dist", euclidean(col("a.embedding"), col("b.embedding")))
      .filter(col("dist") < threshold)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val lsh = Dedup.embedNearDupLsh(e, "vec_id", "embedding", threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(exact.nonEmpty, "fixture must contain near pairs at this threshold")
    assert(lsh.subsetOf(exact), "LSH join must not produce out-of-threshold pairs")
    val recall = lsh.size.toDouble / exact.size
    info(s"LSH recall = $recall (${lsh.size}/${exact.size} pairs)")
    assert(recall >= 0.5, s"recall $recall too low for these LSH settings")
  }
}

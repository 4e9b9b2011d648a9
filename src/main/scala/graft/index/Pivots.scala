package graft.index

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pivot selection for the vector index.
  *
  * The reference hard-codes 10 pivot vectors (`src/vector.ts:43`). Two
  * strategies here:
  *  - [[fromSample]] — data-derived fixed pivots (deterministic; what
  *    the oracle queries use via [[IndexBuild.pivotsFromIds]]);
  *  - [[learnKMeans]] — MLlib KMeans cluster centers as pivots, the
  *    north-star "MLlib for batch index build, not online serving":
  *    training is a batch job over the embedding table; the learned
  *    centers are then baked into the index layout (partition-per-
  *    cluster) and serving never touches MLlib.
  */
object Pivots {

  /** Deterministic sample: embeddings of the k smallest ids. */
  def fromSample(df: DataFrame, idCol: String, embeddingCol: String, k: Int): Seq[Seq[Float]] =
    df.orderBy(col(idCol).asc).limit(k)
      .select(embeddingCol).collect().map(_.getSeq[Float](0)).toSeq

  /** KMeans-learned pivots (coarse IVF centroids). Seeded → reproducible. */
  def learnKMeans(df: DataFrame, embeddingCol: String, k: Int, seed: Long = 42L): Seq[Seq[Float]] = {
    val feats = df.select(array_to_vector(col(embeddingCol)).as("features"))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(20).fit(feats)
    model.clusterCenters.map(_.toArray.map(_.toFloat).toSeq).toSeq
  }
}

package graft.index

import graft.embed.Embedder
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** Batch materialization of the vectors table — the engine's "vector
  * index" (reference: the derived `vectors` collection with five pivot
  * distance index fields, `/root/reference/src/database.ts:176-209`).
  *
  * Output schema: `(id, embedding, dist0..dist{P-1}, cluster)` where
  * `dist_i` = euclidean distance to pivot i (stored numeric — SURVEY
  * §1.4 explains why the reference's fixed-width string encoding is a
  * bug we do not replicate) and `cluster` = argmin pivot (IVF coarse
  * assignment).
  *
  * Layout for scale: the table is written partitioned by `cluster` and
  * sorted within partitions by `dist0`, so
  *  - a pivot-range query's `dist_i BETWEEN lo AND hi` predicate prunes
  *    parquet row groups via min/max stats (the columnar analogue of the
  *    reference's B-tree range scan), and
  *  - an IVF probe reads only the probed clusters' directories
  *    (partition pruning at planning time, before any IO).
  * At 100 TB this is exactly the layout the search path needs; nothing
  * in the query code depends on it (queries recompute distances when
  * handed a raw embeddings table).
  */
object IndexBuild {

  /** Compute pivot distances + cluster assignment for an embeddings df. */
  def withPivotColumns(df: DataFrame, pivots: Seq[Seq[Float]],
      embeddingCol: String = "embedding"): DataFrame = {
    val distCols = pivots.zipWithIndex.map { case (p, i) =>
      euclidean(col(embeddingCol), typedlit(p)).as(s"dist$i")
    }
    val out = df.select((df.columns.toIndexedSeq.map(col) ++ distCols): _*)
    val distArr = array(pivots.indices.map(i => col(s"dist$i")): _*)
    out.withColumn("cluster",
      (array_position(distArr, array_min(distArr)) - 1).cast("int"))
  }

  /** Full batch build: text docs → embed → pivot distances → layout. */
  def buildFromDocuments(docs: DataFrame, idCol: String, textCol: String,
      embedder: Embedder, pivots: Seq[Seq[Float]], outPath: String): Unit = {
    val embedded = Embedder.embedText(
      docs.select(col(idCol).as("id"), col(textCol).as("text")), "text", embedder)
      .drop("text")
    write(withPivotColumns(embedded, pivots), outPath)
  }

  /** Incremental build step: embed + index only the batch rows whose ids
    * are not already in the destination (the reference pipeline
    * handler's skip-already-embedded anti-join idempotence,
    * `src/database.ts:184-192`). Returns number of rows appended.
    */
  def appendNewDocuments(spark: SparkSession, batch: DataFrame, idCol: String,
      textCol: String, embedder: Embedder, pivots: Seq[Seq[Float]],
      outPath: String): Long = {
    val existing: Option[DataFrame] =
      try Some(spark.read.parquet(outPath).select(col("id")))
      catch { case _: Throwable => None }
    val fresh0 = batch.select(col(idCol).as("id"), col(textCol).as("text"))
      .dropDuplicates("id")
    val fresh = existing match {
      case Some(e) => fresh0.join(e, Seq("id"), "left_anti")
      case None => fresh0
    }
    val embedded = Embedder.embedText(fresh, "text", embedder).drop("text")
    // persist: the count and the write must not run the embed pipeline twice
    val indexed = withPivotColumns(embedded, pivots)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = indexed.count()
      if (n > 0) {
        // same partitioned layout as the batch build — mixing a flat
        // append into a cluster-partitioned table corrupts partition
        // discovery and defeats searchIndexed's pruning
        indexed.sortWithinPartitions("dist0")
          .write.mode(SaveMode.Append).partitionBy("cluster").parquet(outPath)
      }
      n
    } finally indexed.unpersist()
  }

  /** Write with the pruning-friendly layout. */
  def write(indexed: DataFrame, outPath: String): Unit =
    indexed
      .repartition(col("cluster"))
      .sortWithinPartitions("dist0")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cluster")
      .parquet(outPath)

  /** Derive pivots from the data: embeddings of the given ids (tiny
    * driver-side collect). A KMeans-learned variant is the MLlib-batch
    * extension ("MLlib for batch index build, not online serving").
    */
  def pivotsFromIds(df: DataFrame, idCol: String, ids: Seq[Int],
      embeddingCol: String = "embedding"): Seq[Seq[Float]] = {
    val m = df.filter(col(idCol).isin(ids: _*))
      .select(col(idCol).cast("long"), col(embeddingCol)).collect()
      .map(r => r.getLong(0).toInt -> r.getSeq[Float](1)).toMap
    ids.map(m(_))
  }
}

package graft

import graft.embed.HashingEmbedder
import graft.functions.VectorFunctions.euclidean
import graft.index.{IndexBuild, Pivots}
import graft.operators.Knn
import org.apache.spark.sql.functions._

/** Build-once / serve-many: kNN served from the materialized IVF table
  * must agree with a fresh computation over the raw data, while its
  * plan prunes partitions + row groups.
  */
class IndexedSearchSpec extends SparkSuite {

  test("searchIndexed == fresh computation over the probed clusters") {
    val out = tmpDir("serve-ivf") + "/vectors"
    val e = HashingEmbedder(dims = 64)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id").cast("string").as("id"), col("text"))
    // build the index once
    val sample = graft.embed.Embedder.embedText(docs.limit(100), "text", e)
      .select("id", "embedding")
    val pivots = Pivots.fromSample(sample, "id", "embedding", 5)
    IndexBuild.buildFromDocuments(docs, "id", "text", e, pivots, out)

    val q = e.embedOne("spark table scan merge")
    val served = Knn.searchIndexed(spark, out, pivots, q, 10, nprobe = 2, eps = 1.0)

    // plan must show partition pruning on cluster
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cluster"), plan.take(2000))

    // equivalence: recompute from the index table without the serving path
    val t = spark.read.parquet(out)
    val qDists = pivots.map { p =>
      math.sqrt(p.zip(q).map { case (a, b) => val d = a.toDouble - b; d * d }.sum)
    }
    val probes = qDists.zipWithIndex.sortBy { case (d, i) => (d, i) }.take(2).map(_._2)
    val lo = qDists.head * 0.0; val hi = qDists.head * 2.0
    val expected = t.filter(col("cluster").isin(probes: _*))
      .filter(col("dist0") > lo && col("dist0") < hi)
      .withColumn("dist", euclidean(col("embedding"), typedlit(q.toSeq)))
      .orderBy(col("dist").asc, col("id").asc).limit(10)
      .select("id").collect().map(_.getString(0)).toSeq

    val got = served.select("id").collect().map(_.getString(0)).toSeq
    assert(got === expected)
    assert(got.size === 10)
  }

  test("KMeans-learned pivots: balanced clusters, served kNN recall vs exact") {
    val out = tmpDir("kmeans-ivf") + "/vectors"
    val e = HashingEmbedder(dims = 64)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id").cast("string").as("id"), col("text"))
    val embedded = graft.embed.Embedder.embedText(docs, "text", e)
      .select("id", "embedding")
    val pivots = Pivots.learnKMeans(embedded, "embedding", k = 8)
    assert(pivots.size === 8)
    IndexBuild.write(IndexBuild.withPivotColumns(embedded, pivots), out)

    val t = spark.read.parquet(out)
    val sizes = t.groupBy("cluster").count().collect().map(_.getLong(1))
    assert(sizes.length === 8, "every learned centroid should own vectors")
    assert(sizes.max < t.count(), "clusters must actually partition the data")

    // serve with nprobe=3 and compare against exact over everything
    val q = e.embedOne("spark join filter table")
    val exact = t
      .withColumn("dist", euclidean(col("embedding"), typedlit(q.toSeq)))
      .orderBy(col("dist").asc, col("id").asc).limit(10)
      .select("id").collect().map(_.getString(0)).toSet
    val served = Knn.searchIndexed(spark, out, pivots, q, 10, nprobe = 3, eps = 10)
      .select("id").collect().map(_.getString(0)).toSet
    val recall = exact.count(served.contains).toDouble / exact.size
    info(s"kmeans-ivf nprobe=3/8 recall@10 = $recall")
    // deterministic (seeded KMeans + deterministic embedder): measured
    // 0.9 on this fixture; assert the bound COVERAGE.md documents
    assert(recall >= 0.8)
  }
}

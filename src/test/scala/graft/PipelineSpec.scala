package graft

import graft.embed.HashingEmbedder
import graft.index.IndexBuild
import graft.streaming.VectorPipeline
import java.nio.file.{Files, Paths}

/** Streaming incremental index build (FIXTURES.md §5): waves of items
  * JSON with re-delivery; assert idempotence (T3), drain semantics (T5)
  * and checkpoint advance (T2).
  */
class PipelineSpec extends SparkSuite {

  private val embedder = HashingEmbedder(dims = 16)
  private val pivots: Seq[Seq[Float]] = Seq(
    embedder.embedOne("alpha pivot one").toSeq,
    embedder.embedOne("beta pivot two").toSeq)

  private def writeWave(dir: String, name: String, docs: Seq[(String, String)]): Unit = {
    val json = docs.map { case (id, body) =>
      s"""{"id":"$id","body":"$body"}"""
    }.mkString("\n")
    Files.writeString(Paths.get(dir, name), json)
  }

  test("wave ingestion: idempotent, checkpointed, drained") {
    val src = tmpDir("items-src")
    val dest = tmpDir("vectors-dest") + "/vectors"
    val ckpt = tmpDir("pipeline-ckpt")
    val pipe = new VectorPipeline(spark, src, dest, ckpt, embedder, pivots,
      maxFilesPerTrigger = 1)

    // importDone gate (RxState): false before any drain, reads blocked
    assert(!pipe.importDone)
    intercept[IllegalArgumentException] { pipe.destinationWhenReady() }

    // wave 1: 6 docs
    writeWave(src, "wave1.json", (1 to 6).map(i => (s"doc$i", s"body text number $i")))
    val n1 = pipe.runAvailableNow()
    assert(n1 === 6)
    assert(pipe.destination().count() === 6)

    // gate open after the drain, persisted: a NEW pipeline instance over
    // the same destination sees it (the reference's reactive RxState
    // record survives the owning db handle)
    assert(pipe.importDone)
    assert(pipe.destinationWhenReady().count() === 6)
    val pipe2 = new VectorPipeline(spark, src, dest, ckpt, embedder, pivots)
    assert(pipe2.importDone, "importDone must be durable, not instance-local")

    // wave 2: 4 new docs + 2 re-delivered (unchanged) from wave 1
    writeWave(src, "wave2.json",
      (7 to 10).map(i => (s"doc$i", s"body text number $i")) ++
        Seq("doc1" -> "body text number 1", "doc2" -> "body text number 2"))
    val n2 = pipe.runAvailableNow()
    assert(n2 === 4, "re-delivered ids must be skipped (anti-join idempotence)")
    assert(pipe.destination().count() === 10)
    assert(pipe.destination().select("id").distinct().count() === 10)

    // third run with no new files: checkpoint makes it a no-op
    val n3 = pipe.runAvailableNow()
    assert(n3 === 0)
    assert(pipe.destination().count() === 10)

    // derived columns present and consistent with a batch re-computation
    val cols = pipe.destination().columns.toSet
    assert(Set("id", "embedding", "dist0", "dist1", "cluster").subsetOf(cols))
  }

  test("batch IndexBuild layout: partitioned by cluster, distances match kernel") {
    import org.apache.spark.sql.functions._
    val out = tmpDir("ivf-layout") + "/vectors"
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id").cast("string").as("id"), col("text"))
      .limit(50)
    IndexBuild.buildFromDocuments(docs, "id", "text", embedder, pivots, out)
    val t = spark.read.parquet(out)
    assert(t.count() === 50)
    // partition pruning: cluster filter reads only matching directories
    val pruned = t.filter(col("cluster") === 0)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(t.select("cluster").distinct().count() <= pivots.size)
    // distances in the table equal a fresh kernel evaluation
    val recomputed = t.withColumn("chk",
      graft.functions.VectorFunctions.euclidean(col("embedding"), typedlit(pivots.head.toArray.toSeq)))
      .filter(abs(col("chk") - col("dist0")) > 1e-12)
    assert(recomputed.count() === 0)
  }
}

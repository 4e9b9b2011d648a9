package graft

import graft.embed.{Embedder, HashingEmbedder}
import org.apache.spark.sql.functions._

class EmbedderSpec extends SparkSuite {
  import spark.implicits._

  private val e = HashingEmbedder(dims = 64)

  test("deterministic: same text same vector, different text different") {
    val a1 = e.embedOne("city in germany").toSeq
    val a2 = e.embedOne("city in germany").toSeq
    val b = e.embedOne("completely different words").toSeq
    assert(a1 === a2)
    assert(a1 !== b)
  }

  test("output is L2-normalized") {
    val v = e.embedOne("some document body text")
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
  }

  test("empty text yields zero vector without crashing") {
    val v = e.embedOne("")
    assert(v.forall(_ === 0f))
  }

  test("embedText plumbing: one vector per row, batched per partition") {
    val docs = Seq(("a", "first doc"), ("b", "second doc"), ("c", "third doc"))
      .toDF("id", "text").repartition(2)
    val out = Embedder.embedText(docs, "text", e)
    assert(out.columns.toSeq === Seq("id", "text", "embedding"))
    val rows = out.select("id", "embedding").collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getSeq[Float](1).size === 64)
    }
    // distributed result equals driver-side embedding
    val viaDf = out.filter(col("id") === "a").select("embedding")
      .head().getSeq[Float](0).toSeq
    assert(viaDf === e.embedOne("first doc").toSeq)
  }
}

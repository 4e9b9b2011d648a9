package graft

import graft.app.CorpusPipeline
import graft.operators.{Corpus, Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** The end-to-end corpus preparation job: monotone retention, stage
  * invariants, and a readable output layout.
  */
class CorpusPipelineSpec extends SparkSuite {

  test("full pipeline: monotone retention, invariants hold on the output") {
    val out = tmpDir("corpus-out") + "/packed"
    val r = CorpusPipeline.run(spark, sf0001, out)
    info(s"retention: $r")

    // retention can only shrink stage over stage, and something survives
    assert(r.input >= r.afterQuality)
    assert(r.afterQuality >= r.afterExact)
    assert(r.afterExact >= r.afterNearDup)
    assert(r.afterNearDup >= r.afterDecontam)
    assert(r.afterDecontam >= r.afterQuota)
    assert(r.afterQuota > 0 && r.shards > 0)

    val packed = spark.read.parquet(out)
    assert(packed.count() === r.afterQuota)

    // mixture quota: no (source, lang) cell exceeds the cap
    val overQuota = packed.groupBy("source", "lang").count()
      .filter(col("count") > CorpusPipeline.PipelineQuota).count()
    assert(overQuota === 0)

    // the held-out benchmark set must not appear in the training output
    assert(packed.filter(col("doc_id") < Corpus.BenchIdMax).count() === 0)

    // quality gate: no survivor is too short or too repetitive
    val toks = TextAnalysis.tokens(col("text"))
    val bad = packed.filter(size(toks) < 20 ||
      size(array_distinct(toks)).cast("long") * 2 <= size(toks).cast("long")).count()
    assert(bad === 0)

    // exact dedup: fingerprints are unique among survivors
    val fps = packed.select(TextAnalysis.fingerprint(col("text")).as("fp"))
    assert(fps.count() === fps.distinct().count())

    // shards respect the per-source cumulative budget layout
    val shardsOk = packed
      .groupBy("source", "shard").agg(sum("n_tokens").as("tok"))
      .filter(col("shard") >= 0)
    assert(shardsOk.count() === r.shards)

    // export manifest: one row per packed doc; positions contiguous
    // from 1 and offsets equal the running sum of preceding UTF-8 byte
    // lengths within each (source, shard)
    val manifest = spark.read.parquet(out + "_manifest")
    assert(manifest.count() === r.afterQuota)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source", "shard").orderBy("doc_id")
    val checked = manifest
      .withColumn("exp_pos", row_number().over(w).cast("long"))
      .withColumn("exp_off", coalesce(sum("n_bytes").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
    assert(checked.filter(col("pos") =!= col("exp_pos") ||
      col("byte_offset") =!= col("exp_off")).count() === 0)
  }
}

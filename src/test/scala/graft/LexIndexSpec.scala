package graft

import graft.operators.Hybrid
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Lexical-index lifecycle: delta appends must leave the stored
  * postings identical (as a set) to an all-at-once build of the full
  * corpus, publishes must be snapshot-isolated, stats counters must
  * accumulate, and compaction must change only the file layout.
  */
class LexIndexSpec extends SparkSuite {

  private def postingsSet(dir: String): Set[(String, Long, Long, Long)] =
    spark.read.parquet(dir).select("term", "doc_id", "dl", "tf")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("delta append == all-at-once build; snapshots immutable; compaction layout-only") {
    val base = tmpDir("lexidx")
    val full = spark.read.parquet(s"$sf0001/documents.parquet")
    full.filter(col("doc_id") < 250).write.parquet(s"$base/documents.parquet")
    val v0 = Hybrid.ensureLexIndex(spark, base)
    val basePosts = spark.read.parquet(s"$v0/postings").count()

    val delta = full.filter(col("doc_id") >= 250)
    assert(delta.count() > 0 && basePosts > 0, "fixture must split into base + delta")
    val v1 = Hybrid.appendLexIndex(spark, base, delta)
    assert(v1 !== v0)
    assert(spark.read.parquet(s"$v0/postings").count() === basePosts,
      "pre-append snapshot must be immutable")

    val fullDir = tmpDir("lexidx-full")
    full.write.parquet(s"$fullDir/documents.parquet")
    val vf = Hybrid.ensureLexIndex(spark, fullDir)
    assert(postingsSet(s"$v1/postings") === postingsSet(s"$vf/postings"),
      "grown postings must equal the one-shot build")
    val (m, mf) = (spark.read.parquet(s"$v1/meta").head(),
      spark.read.parquet(s"$vf/meta").head())
    assert((m.getLong(0), m.getLong(1)) === (mf.getLong(0), mf.getLong(1)),
      "stats counters must accumulate to the full corpus's")

    // serving: appended index answers EXACTLY like the one-shot index
    // (h5 reads only the stored artifact, so this isolates the index)
    val a = Hybrid.h5Bm25Indexed(spark, base).collect().map(_.toSeq).toSeq
    val b = Hybrid.h5Bm25Indexed(spark, fullDir).collect().map(_.toSeq).toSeq
    assert(a.nonEmpty && a === b)

    // compaction: a new version, same rows, same serving output
    val v2 = Hybrid.compactLexIndex(spark, base)
    assert(v2 !== v1)
    assert(postingsSet(s"$v2/postings") === postingsSet(s"$vf/postings"))
    assert(Hybrid.h5Bm25Indexed(spark, base).collect().map(_.toSeq).toSeq === a)
  }

  test("first delta append onto an EMPTY-corpus index (NULL t_tokens) accumulates") {
    val base = tmpDir("lexidx-empty")
    val full = spark.read.parquet(s"$sf0001/documents.parquet")
    // zero rows, real schema: sum(dl) over no rows stores t_tokens = NULL
    full.filter(col("doc_id") < 0).write.parquet(s"$base/documents.parquet")
    val v0 = Hybrid.ensureLexIndex(spark, base)
    val m0 = spark.read.parquet(s"$v0/meta").head()
    assert(m0.getLong(0) === 0L)
    assert(m0.isNullAt(1), "fixture must hit the NULL base-stats case")

    val delta = full.filter(col("doc_id") < 250)
    val v1 = Hybrid.appendLexIndex(spark, base, delta) // NPE'd before the base-side guard
    val fullDir = tmpDir("lexidx-empty-full")
    delta.write.parquet(s"$fullDir/documents.parquet")
    val vf = Hybrid.ensureLexIndex(spark, fullDir)
    val (m1, mf) = (spark.read.parquet(s"$v1/meta").head(),
      spark.read.parquet(s"$vf/meta").head())
    assert((m1.getLong(0), m1.getLong(1)) === (mf.getLong(0), mf.getLong(1)),
      "append onto the empty index must equal a one-shot build's counters")
    assert(postingsSet(s"$v1/postings") === postingsSet(s"$vf/postings"))
  }

  test("trickle appends fragment the buckets and auto-compact at the threshold") {
    val base = tmpDir("lexidx-trickle")
    val full = spark.read.parquet(s"$sf0001/documents.parquet")
    full.filter(col("doc_id") < 100).write.parquet(s"$base/documents.parquet")
    Hybrid.ensureLexIndex(spark, base)

    def fileCount(v: String): Int =
      Option(new java.io.File(s"$v/postings").listFiles()).getOrElse(Array.empty)
        .filter(d => d.isDirectory && d.getName.startsWith("bucket="))
        .map(d => d.listFiles().count(f =>
          f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))).sum

    var compacted = false
    var prev = Hybrid.ensureLexIndex(spark, base)
    var last = prev
    for (i <- 0 until 8) {
      val lo = 100 + i * 50
      val batch = full.filter(col("doc_id") >= lo && col("doc_id") < lo + 50)
      last = Hybrid.appendLexIndex(spark, base, batch)
      // the append's own publish fragments; if the threshold tripped,
      // appendLexIndex compacted and the live file count collapsed
      if (fileCount(last) < fileCount(prev)) compacted = true
      prev = last
    }
    assert(compacted, "trickle ingest must cross the threshold and auto-compact")
    assert(fileCount(last) <= Hybrid.LexCompactFiles)
    // data intact after the whole trickle + compactions
    val fullDir = tmpDir("lexidx-trickle-full")
    full.filter(col("doc_id") < 500).write.parquet(s"$fullDir/documents.parquet")
    val vf = Hybrid.ensureLexIndex(spark, fullDir)
    assert(postingsSet(s"$last/postings") === postingsSet(s"$vf/postings"))
  }
}

package graft

import graft.operators.Indexed
import org.apache.spark.sql.functions._

/** Index compaction: after a run of delta appends (one small file
  * each), compacting must collapse the file count back to the bulk
  * layout, preserve the row set exactly, publish a NEW version (old
  * version left intact for in-flight readers), and leave the serving
  * path reading the compacted copy.
  */
class CompactionSpec extends SparkSuite {

  private def parquetFiles(dir: String): Seq[java.io.File] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq

  test("append-heavy assignment table compacts to the bulk layout, same rows") {
    val base = tmpDir("compact")
    val full = spark.read.parquet(s"$sf0001/embeddings.parquet")
    full.filter(col("vec_id") < 300).write.parquet(s"$base/embeddings.parquet")

    val before = Indexed.ensureAssignments(spark, base)
    // five delta batches → five extra files beyond the bulk build
    for (lo <- 300L until 500L by 40L)
      Indexed.appendAssignments(spark, base,
        full.filter(col("vec_id") >= lo && col("vec_id") < lo + 40))
    val appendedFiles = parquetFiles(before).size
    val rowsBefore = spark.read.parquet(before)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

    val after = Indexed.compactAssignments(spark, base)
    assert(after !== before, "compaction must publish a NEW version dir")
    assert(new java.io.File(before).isDirectory,
      "old version must survive for in-flight readers")
    assert(Indexed.assignPath(base) === after,
      "serving path must resolve to the compacted version")

    val rowsAfter = spark.read.parquet(after)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rowsAfter === rowsBefore, "compaction must not change the row set")
    assert(parquetFiles(after).size < appendedFiles,
      s"expected fewer files than the ${appendedFiles}-file append history")
    assert(parquetFiles(after).size <= Indexed.BuildTasks,
      "compacted layout must be at most one file per build task")
  }
}

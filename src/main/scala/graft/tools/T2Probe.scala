package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** One-off probe: times each component of q_t2_quality in isolation to
  * attribute its bench cost (round-9 root-cause of the r8 guard-confirmed
  * regression). Not part of the library surface.
  */
object T2Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("t2-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.write.format("noop").mode("overwrite").save() // warm scan

    val stops = Seq("the", "a", "and", "of", "to", "der", "die", "das", "und", "ist",
      "le", "la", "les", "et", "est", "el", "los", "y", "es", "un")

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      // run twice, report both (first includes codegen compile)
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s ${ts.map(t => f"$t%.3f").mkString("  ")}")
    }

    val base = docs.select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))
    val toks = col("toks")
    val n = size(toks).cast("long")

    time("full_query_cold") { graft.operators.TextAnalysis.t2Quality(spark, sfDir) }
    time("split_only") { base }
    time("size_only") { base.select(col("doc_id"), n.as("n_tokens")) }
    time("stop_filter_hof") { base.select(col("doc_id"),
      size(filter(toks, t => t.isin(stops: _*))).cast("long").as("hits")) }
    time("array_distinct") { base.select(col("doc_id"),
      size(array_distinct(toks)).cast("long").as("nd")) }
    time("aggregate_hof") { base.select(col("doc_id"),
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("wlen")) }
    time("all_no_round") { base.select(col("doc_id"),
      n.as("n_tokens"),
      (aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / n).as("avg_wlen"),
      (size(filter(toks, t => t.isin(stops: _*))).cast("double") / n).as("stop_ratio"),
      (size(array_distinct(toks)).cast("double") / n).as("distinct_ratio")) }
    time("all_with_round_sort") { base.select(col("doc_id"),
      n.as("n_tokens"),
      round(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / n, 3).as("avg_wlen"),
      round(size(filter(toks, t => t.isin(stops: _*))).cast("double") / n, 3).as("stop_ratio"),
      round(size(array_distinct(toks)).cast("double") / n, 3).as("distinct_ratio"),
      round(least(n.cast("double") / 100, lit(1.0)) * 0.5 +
        size(array_distinct(toks)).cast("double") / n * 0.5, 3).as("quality"))
      .orderBy("doc_id") }
    time("full_query") { graft.operators.TextAnalysis.t2Quality(spark, sfDir) }
    spark.stop()
  }
}

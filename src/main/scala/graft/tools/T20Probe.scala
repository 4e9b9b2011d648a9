package graft.tools

import graft.operators.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: attributes q_t20_heavy_hitters' bench cost between
  * pass 1 (Misra-Gries sketch) and pass 2 (candidate recount + top-k),
  * warm vs cold. Not part of the library surface.
  */
object T20Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("t20-probe")
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

    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[t20probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val n1 = greatest(size(col("toks")) - 1, lit(0))
    val bg = zip_with(slice(col("toks"), lit(1), n1), slice(col("toks"), lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
    def terms = docs.select(TextAnalysis.tokens(col("text")).as("toks"))
      .select(explode(bg).as("term"))

    for (round <- 1 to 3) {
      t(s"r$round bigram scan only") { terms.write.format("noop").mode("overwrite").save() }
      t(s"r$round pass1 sketch") {
        terms.agg(graft.functions.MisraGries.sketch(col("term"), TextAnalysis.HHSketchM),
          count(lit(1))).head()
      }
      t(s"r$round full t20") { TextAnalysis.t20HeavyHitters(spark, sfDir).collect() }
    }
    spark.stop()
  }
}

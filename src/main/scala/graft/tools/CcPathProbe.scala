package graft.tools
import graft.core.Tables
import graft.operators.{Corpus, Dedup, Graph}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch probe: isolate the cc_core CC term of the full stats build
  * at CensusProbe's x10 replication.
  */
object CcPathProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = java.nio.file.Files.createTempDirectory("ccp-wh").toString
    sys.props("graft.warehouse") = wh
    val xrep = 10
    val full = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .crossJoin(spark.range(xrep.toLong).select(col("id").as("__rep")))
      .withColumn("vec_id", col("vec_id") * xrep + col("__rep"))
      .withColumn("embedding",
        expr("transform(embedding, (x, i) -> CASE WHEN __rep > 0 AND i = CAST(__rep % 64 AS INT) THEN -x ELSE x END)"))
      .drop("__rep")
    val d = java.nio.file.Files.createTempDirectory("ccp-d").toString
    full.write.parquet(s"$d/embeddings.parquet")
    val g = Graph.ensureKnnGraph(spark, d)
    val pairs = spark.read.parquet(s"$g/pairs").select("id_a", "id_b", "w")
    val core = pairs.filter(col("w") >= Graph.CoreWmin).select("id_a", "id_b").cache()
    println("core_edges=" + core.count())
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"$tag: ${(System.nanoTime()-t0)/1e9}s"); r }
    time("kcore") { Graph.kcoreOn(
      core.select(col("id_a").as("src"), col("id_b").as("dst"))).count() }
    println("peelMode=" + Graph.lastPeelMode)
    time("ccstar1") { Corpus.connectedComponentsStar(core, "id_a", "id_b").count() }
    println("ccMode=" + Corpus.lastCcMode)
    time("ccstar2") { Corpus.connectedComponentsStar(core, "id_a", "id_b").count() }
    // raised budget: does the driver path still win (and stay safe)
    // at ~1.9M edges on the 8g driver convention?
    spark.conf.set("graft.graph.driverEdgeBudget", "4000000")
    time("ccstar_drv") { Corpus.connectedComponentsStar(core, "id_a", "id_b").count() }
    println("ccMode=" + Corpus.lastCcMode)
    time("kcore_drv") { Graph.kcoreOn(
      core.select(col("id_a").as("src"), col("id_b").as("dst"))).count() }
    println("peelMode=" + Graph.lastPeelMode)
    val rt = Runtime.getRuntime
    println("heap_used_mb=" + (rt.totalMemory - rt.freeMemory) / 1048576)
    spark.stop()
  }
}

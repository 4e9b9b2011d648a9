package graft.tmpdebug
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Dedup, Graph}
object GDebug {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PHASE $name%-22s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val e = spark.read.parquet(d + "/embeddings.parquet")
    val ids = e.select(col("vec_id"), col("embedding")).repartition(32, col("vec_id"))
    val buckets = t("buckets-build+cache") { val b = Dedup.cacheSlot("dbg-buckets", ids.select(col("vec_id"),
        posexplode(graft.functions.SrpKernel.srpBuckets(col("embedding"), Dedup.SrpProj)).as(Seq("tbl","bkt")))
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy("tbl","bkt")))
      .filter(col("bsz") <= Dedup.MaxBucket).drop("bsz")); println("  rows="+b.count()); b }
    val cand = buckets.as("a").join(buckets.as("b"),
        col("a.tbl")===col("b.tbl") && col("a.bkt")===col("b.bkt") && col("a.vec_id")<col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b")).distinct()
    t("cand-count") { println("  rows="+cand.count()) }
    val scored = cand
      .join(ids.select(col("vec_id").as("id_a"), col("embedding").as("e_a")), "id_a")
      .join(ids.select(col("vec_id").as("id_b"), col("embedding").as("e_b")), "id_b")
      .select(col("id_a"), col("id_b"), Graph.intDot(col("e_a"), col("e_b")).as("w"))
    t("scored-count-uncached") { println("  rows="+scored.count()) }
    t("scored-count-again") { println("  rows="+scored.count()) }
    t("g1-full") { Graph.g1KnnGraph(spark, d).write.format("noop").mode("overwrite").save() }
    t("g1-again") { Graph.g1KnnGraph(spark, d).write.format("noop").mode("overwrite").save() }
    t("g2-full") { Graph.g2PageRank(spark, d).write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}

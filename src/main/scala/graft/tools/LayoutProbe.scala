package graft.tools

import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Storage-layout probe (dev tool): codec and row-group-size tradeoffs
  * for the warehouse tables. At 100 TB the choice is dominated by scan
  * throughput vs storage cost; this prints bytes + repeated-scan times
  * per variant so ARCHITECTURE.md's layout recommendation is measured,
  * not guessed.
  */
object LayoutProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val work = java.nio.file.Files.createTempDirectory("layoutprobe").toString
    val li = Tables.lineitem(spark, d)

    def dirBytes(p: String): Long = {
      val root = new java.io.File(p)
      Option(root.listFiles()).map(_.filter(_.isFile).map(_.length()).sum).getOrElse(0L)
    }

    def scanTime(p: String): Double = {
      val t0 = System.nanoTime()
      spark.read.parquet(p)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag").agg(sum("l_quantity"), sum("l_extendedprice"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val variants = Seq(
      ("snappy", Map("compression" -> "snappy")),
      ("zstd", Map("compression" -> "zstd")),
      ("gzip", Map("compression" -> "gzip")),
      ("uncompressed", Map("compression" -> "uncompressed")))

    println(f"${"variant"}%-14s ${"MB"}%8s ${"scan1_s"}%8s ${"scan2_s"}%8s ${"scan3_s"}%8s")
    for ((name, opts) <- variants) {
      val p = s"$work/li_$name"
      li.write.mode(SaveMode.Overwrite).options(opts).parquet(p)
      val mb = dirBytes(p) / 1e6
      val t1 = scanTime(p); val t2 = scanTime(p); val t3 = scanTime(p)
      println(f"$name%-14s $mb%8.1f $t1%8.2f $t2%8.2f $t3%8.2f")
    }
    spark.stop()
  }
}

package graft.app

import graft.embed.HashingEmbedder
import graft.functions.VectorFunctions._
import graft.index.{IndexBuild, Pivots}
import graft.streaming.VectorPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** End-to-end demo mirroring the reference app's three entry points
  * (SURVEY §3): C — bulk load; B — incremental embed+index pipeline;
  * A — interactive kNN with hydrated, ranked results (default query
  * "city in germany", `src/index.html:49-53`), with per-phase timing
  * like the reference's `time(ctx)` instrumentation.
  *
  * Run: `sbt "runMain graft.app.Demo [sfDir] [query...]"`
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val queryText = if (args.length > 1) args.drop(1).mkString(" ") else "city in germany"

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[time] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val work = java.nio.file.Files.createTempDirectory("graft-demo").toString
    val itemsDir = s"$work/items"; val vectorsDir = s"$work/vectors"
    val srcDir = s"$work/incoming"; val ckptDir = s"$work/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))

    // ---- entry point C: bulk load items (src/database.ts:147-158)
    val docs = time("C: bulk load items") {
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id").cast("string").as("id"),
          concat(lit("Title: doc-"), col("doc_id"), lit(" Content: "), col("text")).as("body"))
      d.write.mode(SaveMode.Overwrite).parquet(itemsDir)
      spark.read.parquet(itemsDir)
    }
    println(s"       items: ${docs.count()} docs")

    // ---- entry point B: incremental embed+index pipeline (src/database.ts:160-209)
    val embedder = HashingEmbedder(dims = 64)
    val pivots = time("B0: learn pivots (MLlib KMeans)") {
      val sample = graft.embed.Embedder
        .embedText(docs.limit(200), "body", embedder).select("embedding")
      Pivots.learnKMeans(sample, "embedding", k = 5)
    }
    time("B1: drain pipeline (AvailableNow)") {
      // feed the items through the streaming source in JSON waves
      docs.coalesce(2).write.mode(SaveMode.Overwrite).json(srcDir)
      new VectorPipeline(spark, srcDir, vectorsDir, ckptDir, embedder, pivots).runAvailableNow()
    }
    val vectors = spark.read.parquet(vectorsDir)
    println(s"       vectors: ${vectors.count()} rows, " +
      s"clusters: ${vectors.select("cluster").distinct().count()}")

    // ---- entry point A: kNN search (src/search.ts)
    val qArr = time("A0: embed query")(embedder.embedOne(queryText))
    val qVec = typedlit(qArr.toSeq)
    val top = time("A1: index-range kNN + hydrate") {
      val qd = pivots.map { p =>
        math.sqrt(p.indices.map { i =>
          val d = p(i).toDouble - qArr(i); d * d
        }.sum)
      }
      val branches = pivots.indices.map { i =>
        vectors.filter(col(s"dist$i") > qd(i) * 0.8 && col(s"dist$i") < qd(i) * 1.2)
          .select("id", "embedding")
      }
      val topk = branches.reduce(_ union _).dropDuplicates("id")
        .withColumn("distance", euclidean(col("embedding"), qVec))
        .orderBy(col("distance").asc, col("id").asc).limit(10)
      docs.join(broadcast(topk), "id")
        .select(col("id"), round(col("distance"), 4).as("distance"),
          regexp_extract(col("body"), "Title: (.*?) Content:", 1).as("title"))
        .orderBy("distance", "id")
    }
    println(s"""       query: "$queryText"""")
    top.collect().zipWithIndex.foreach { case (r, i) =>
      println(f"       #${i + 1}%-3d ${r.getAs[String]("title")}%-20s d=${r.getAs[Double]("distance")}")
    }
    spark.stop()
  }
}

package graft.tools

import graft.operators.Indexed
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Dev probe: where does driver-side batch probe selection stop being
  * negligible? Times probe/ADC-table construction for |Q| = 1e2..1e4
  * on BOTH paths — collect-and-compute on the driver vs the
  * distributed queries ⋈ broadcast-structures job — using the sf dir's
  * frozen centroids/codebook and replicated query vectors. The
  * crossover informs [[graft.operators.Indexed.BatchDriverMaxQ]];
  * results recorded in ARCHITECTURE.md.
  */
object BatchProbeCrossover {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cents = Indexed.ensureCentroids(spark, d)
    val cb = Indexed.ensureCodebook(spark, d)
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
      .select("vec_id", "embedding")
    val nBase = emb.count()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val work = java.nio.file.Files.createTempDirectory("batchprobe").toString
    for (q <- Seq(100, 1000, 10000)) {
      val rep = math.max(1, math.ceil(q.toDouble / nBase).toInt)
      val path = s"$work/q$q.parquet"
      emb.crossJoin(spark.range(rep).select(col("id").as("__r")))
        .withColumn("vec_id", col("vec_id") * rep + col("__r")).drop("__r")
        .limit(q).write.mode(SaveMode.Overwrite).parquet(path)
      val queries = spark.read.parquet(path)

      // driver path: one collect, then scalar loops on one thread
      val tDriver = time {
        val qv = queries.collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1)))
        qv.foreach { case (_, v) =>
          val probes = cents.map(i => i).zipWithIndex // force shape
          probes.size: Unit
        }
        // the real arithmetic: probe argmins + ADC tables
        qv.foreach { case (_, v) =>
          cents.map(c => {
            var acc = 0.0; var i = 0
            while (i < v.size) { val dd = v(i) - c(i); acc += dd * dd; i += 1 }
            acc
          }).zipWithIndex.sortBy(_._1).take(Indexed.NProbe)
        }
        qv.foreach { case (_, v) =>
          val subDim = cb.head.head.size
          var m = 0
          while (m < cb.size) {
            cb(m).foreach { c =>
              var acc = 0.0; var i = 0
              while (i < subDim) {
                val dd = v(m * subDim + i) - c(i); acc += dd * dd; i += 1
              }
            }
            m += 1
          }
        }
      }

      // distributed path: the fallback job, forced end-to-end
      val tDist = time {
        val (p, t) = Indexed.batchProbeTablesDistributed(spark, queries, cents, cb)
        p.write.format("noop").mode("overwrite").save()
        t.write.format("noop").mode("overwrite").save()
      }
      println(f"|Q|=$q%6d  driver=${tDriver}%.3f s  distributed=${tDist}%.3f s")
    }
    spark.stop()
  }
}

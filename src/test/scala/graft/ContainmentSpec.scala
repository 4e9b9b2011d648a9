package graft

import graft.operators.{Dedup, Indexed}
import org.apache.spark.sql.functions._

/** d14 containment dedup + v22 cluster balance.
  *
  * The d14 synthetic fixture is the operator's reason to exist: a short
  * doc quoted wholesale inside a much longer one. Symmetric Jaccard on
  * the pair is |A|/|B| (small by construction, far under
  * [[Dedup.JaccardThreshold]]), so the d2 family never pairs them —
  * containment must.
  */
class ContainmentSpec extends SparkSuite {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("d14 finds a short doc embedded in a long one that Jaccard misses") {
    val quoted = (1 to 12).map(i => s"alpha$i beta$i gamma$i").mkString(" ")
    val filler = (1 to 120).map(i => s"filler$i noise$i pad$i").mkString(" ")
    val fixture = docs(
      1L -> quoted,                      // the short original
      2L -> s"$filler $quoted",          // quotes it wholesale
      3L -> (1 to 40).map(i => s"unrelated$i token$i").mkString(" "))

    val pairs = Dedup.d14ContainmentOn(fixture)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)),
      s"expected exactly the (contained=1, container=2) pair, got ${pairs.toSeq}")
    assert(pairs.head._3 >= 0.9, s"wholesale quote must score near 1.0: ${pairs.head._3}")

    // the same pair is invisible to symmetric Jaccard at the d2 threshold
    val jacPairs = Dedup.d2MinhashLshOn(fixture).collect()
    assert(jacPairs.isEmpty,
      s"fixture must sit below the symmetric-Jaccard threshold, got ${jacPairs.toSeq}")
  }

  test("d14 min-shared prune: a short common header alone pairs nothing") {
    val fixture = docs(
      1L -> ("common header line " + (1 to 30).map(i => s"a$i b$i").mkString(" ")),
      2L -> ("common header line " + (1 to 30).map(i => s"c$i d$i").mkString(" ")))
    assert(Dedup.d14ContainmentOn(fixture).collect().isEmpty)
  }

  test("d14 df cap: corpus-wide boilerplate shingles stop generating candidates") {
    // every doc = the same 8-token boilerplate block (6 shingles, enough
    // to clear the min-shared prune) + unique filler. With nDocs > the
    // cap, every boilerplate shingle has df = nDocs > ContainDfCap and
    // is dropped from the postings — no candidates at all. The SAME
    // corpus truncated under the cap is the positive control: those
    // shingles survive and every doc pair is a candidate (then the
    // exact verify scores them low — boilerplate is a minority of each
    // doc — so candidates are counted on the pre-verify pipeline).
    def boiler(id: Long) =
      id -> ("shared head block of eight tokens exactly " +
        (1 to 20).map(i => s"u${id}x$i").mkString(" "))
    val over = docs((0L until (Dedup.ContainDfCap + 2L)).map(boiler): _*)
    assert(Dedup.d14ContainmentOn(over).collect().isEmpty,
      "df > cap must drop the boilerplate postings entirely")

    val under = docs((0L until (Dedup.ContainDfCap - 50L)).map(boiler): _*)
    val sh = under.select(col("doc_id"), Dedup.shingles(col("text")).as("gs"))
    val candAlive = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .filter(size(array_intersect(col("a.gs"), col("b.gs"))) >= Dedup.ContainMinShared)
      .count()
    assert(candAlive > 0, "control: under the cap the shared shingles must pair")
  }

  test("d14 plan: no cartesian product, candidates via the shingle equi-join") {
    val p = Dedup.d14ContainmentOn(
      spark.read.parquet(s"$sf0001/documents.parquet"))
      .queryExecution.executedPlan.toString()
    assert(!p.contains("CartesianProduct"), "containment must never go all-pairs")
  }

  test("v23 quant error: tail counts match build-time rates, drift swells them") {
    val rows = Indexed.v23QuantError(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (0 until Indexed.PqM).toSeq, "one row per subspace")
    val corpus = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    rows.foreach { case (m, n, tail, outlier) =>
      assert(n == corpus, s"subspace $m must audit every vector")
      assert(outlier <= tail, s"nested thresholds must nest: m=$m $outlier > $tail")
      // the thresholds sit at the build-time p90 / near-max: a healthy
      // frozen codebook keeps the tail a minority and outliers rare
      assert(tail < n / 2, s"m=$m: p90-threshold tail must be a minority, got $tail/$n")
      assert(outlier < n / 10, s"m=$m: near-max outliers must be rare, got $outlier/$n")
    }

    // no cartesian, and the 4-key groupBy partial-aggregates map-side
    val p = Indexed.v23QuantError(spark, sf0001)
      .queryExecution.executedPlan.toString()
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("HashAggregate"), s"expected hash aggregate:\n${p.take(1500)}")
  }

  test("v22 cluster balance: every cell accounted, shares floor-exact") {
    val rows = Indexed.v22ClusterBalance(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == Indexed.CentroidK, "one row per centroid cell, empty included")
    assert(rows.map(_._1).toSeq == (0 until Indexed.CentroidK).toSeq)
    val total = rows.map(_._2).sum
    val corpus = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    assert(total == corpus, s"cell sizes must partition the corpus: $total vs $corpus")
    rows.foreach { case (cid, sz, share) =>
      assert(share == sz * 1000L / total, s"share_x1000 drifted for cell $cid")
    }
  }
}

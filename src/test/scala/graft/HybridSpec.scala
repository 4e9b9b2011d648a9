package graft

import graft.functions.VectorFunctions.cosine
import graft.operators.{Hybrid, Knn}
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Hybrid-retrieval semantics, verified against independent arithmetic:
  *  - the integer-rational BM25 column equals a from-scratch Scala
  *    evaluation of the same closed form over the real corpus;
  *  - RRF fusion is re-derived from the two legs' own rankings;
  *  - the MMR selection is checked against the greedy OPTIMALITY
  *    conditions (each pick maximizes the marginal score given the
  *    collected sim matrix), not by re-running the operator's loop —
  *    and the diversification penalty provably binds on the fixture.
  */
class HybridSpec extends SparkSuite {

  /** Spark's `split(lower(trim(text)), "\\s+", -1)` in Scala. */
  private def toks(text: String): Array[String] =
    text.trim.toLowerCase.split("\\s+", -1)

  test("integer BM25 equals a direct Scala evaluation of the rational form") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> toks(r.getString(1))).toMap
    val n = docs.size.toLong
    val dl = docs.map { case (id, t) => id -> t.length.toLong }
    val adl = dl.values.sum / n // integer-truncated, as in the plan
    val df = Hybrid.QueryTerms.map(q =>
      q -> docs.values.count(_.contains(q)).toLong).toMap
    def score(id: Long): Long = Hybrid.QueryTerms.map { q =>
      val tf = docs(id).count(_ == q).toLong
      val idf = (1000L * (n - df(q) + 1)) / (df(q) + 1)
      val tfPart = (44000L * adl * tf) / (20L * adl * tf + 6L * adl + 18L * dl(id))
      idf * tfPart
    }.sum

    val got = Hybrid.bm25Scored(spark, sf0001)
      .select("doc_id", "bm25_scaled").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === docs.keySet)
    got.foreach { case (id, s) => assert(s === score(id), s"doc $id") }
    // non-vacuity: both idf regimes actually contribute on this corpus
    assert(got.values.exists(_ > 0), "some doc must match some term")
    assert(df(Hybrid.QueryTerms.head) * 10 < n,
      "first term must be rare (high-idf regime)")
  }

  test("indexed BM25 serving equals the scan path, row for row") {
    // h5 answers from the stored postings artifact; h1 from the corpus
    // scan. Identical output (schema AND values) is the build+serving
    // correctness statement — the already-proven h1 arithmetic carries
    // over to the index path.
    val a = Hybrid.h1Bm25Topk(spark, sf0001).collect().map(_.toSeq).toSeq
    val b = Hybrid.h5Bm25Indexed(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(a.nonEmpty)
    assert(b === a)
    assert(Hybrid.h1Bm25Topk(spark, sf0001).columns.toSeq ===
      Hybrid.h5Bm25Indexed(spark, sf0001).columns.toSeq)
  }

  test("driver-side term bucket equals the in-plan hash the layout is written with") {
    // the serve path routes query terms to postings partitions via a
    // driver-evaluated xxhash64; if it ever drifted from the hash the
    // WRITER uses (postingsOf's in-plan pmod(xxhash64(term), B)), a
    // query would silently prune away its own term's partition
    val terms = (Hybrid.QueryTerms ++ Hybrid.PhraseTerms).distinct
    val row = spark.range(1).select(terms.zipWithIndex.map { case (t, i) =>
      pmod(xxhash64(lit(t)), lit(Hybrid.LexBuckets.toLong)).cast("int").as(s"b_$i")
    }: _*).head()
    for ((t, i) <- terms.zipWithIndex)
      assert(Hybrid.termBucket(t) === row.getInt(i), s"bucket drift for term '$t'")
  }

  test("PRF expansion re-derived end-to-end in Scala") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> toks(r.getString(1))).toMap
    val n = docs.size.toLong
    val dl = docs.map { case (id, t) => id -> t.length.toLong }
    val adl = dl.values.sum / n
    def dfOf(term: String): Long = docs.values.count(_.contains(term)).toLong
    def contrib(id: Long, term: String, den: Long): Long = {
      val tf = docs(id).count(_ == term).toLong
      val df = dfOf(term)
      val idf = (1000L * (n - df + 1)) / (df + 1)
      (idf * ((44000L * adl * tf) / (20L * adl * tf + 6L * adl + 18L * dl(id)))) / den
    }
    def base(id: Long): Long = Hybrid.QueryTerms.map(contrib(id, _, 1L)).sum

    val cand = docs.keys.toSeq.map(id => (id, base(id))).filter(_._2 > 0)
      .sortBy { case (id, s) => (-s, id) }.take(Hybrid.PrfCand)
    val prf = cand.take(Hybrid.PrfDocs).map(_._1)
    val expTerms = prf.flatMap(docs(_))
      .filter(t => t.nonEmpty && !Hybrid.QueryTerms.contains(t))
      .groupBy(identity).map { case (t, xs) => (t, xs.size) }.toSeq
      .sortBy { case (t, c) => (-c, t) }.take(Hybrid.PrfExpand).map(_._1)
    assert(expTerms.size === Hybrid.PrfExpand, "fixture must yield a full expansion set")
    val expected = cand.map { case (id, b) =>
      val boost = expTerms.map(contrib(id, _, 2L)).sum
      (id, b, boost, b + boost)
    }.sortBy { case (id, _, _, x) => (-x, id) }.take(Hybrid.Bm25TopK)

    val got = Hybrid.h4PrfExpand(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expected)
    // non-vacuity: expansion contributes, and it genuinely reorders the
    // candidate pool (the top-15 prefix may coincide; the pool may not)
    assert(got.exists(_._3 > 0), "some candidate must gain boost")
    val full = cand.map { case (id, b) =>
      (id, b, b + expTerms.map(contrib(id, _, 2L)).sum) }
    val byBase = full.sortBy { case (id, b, _) => (-b, id) }.map(_._1)
    val byExp  = full.sortBy { case (id, _, x) => (-x, id) }.map(_._1)
    assert(byBase !== byExp, "expansion must reorder the candidate pool")
  }

  test("RRF fusion re-derived from the legs' own rankings") {
    // lexical leg from the (already-verified) BM25 column
    val lex = Hybrid.bm25Scored(spark, sf0001)
      .filter(col("bm25_scaled") > 0)
      .select("doc_id", "bm25_scaled").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, s) => (-s, id) }.take(Hybrid.RrfLegK)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    // vector leg via the engine's own cosine kernel (ranking only —
    // double determinism of the kernel is VectorFunctionsSpec's job)
    val q = Knn.embeddingLit(spark, sf0001, Knn.QueryId)
    val vec = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") =!= Knn.QueryId)
      .select(col("vec_id"), cosine(col("embedding"), q).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(Hybrid.RrfLegK)
      .collect().map(_.getLong(0))
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap

    def rrf(id: Long): Long =
      lex.get(id).map(r => Hybrid.RrfScale / (Hybrid.RrfC + r)).getOrElse(0L) +
        vec.get(id).map(r => Hybrid.RrfScale / (Hybrid.RrfC + r)).getOrElse(0L)
    val expected = (lex.keySet ++ vec.keySet).toSeq
      .map(id => (id, rrf(id)))
      .sortBy { case (id, s) => (-s, id) }.take(Hybrid.RrfTopK)

    val got = Hybrid.h2HybridRrf(spark, sf0001)
      .select("doc_id", "rrf_scaled").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(_._1).toSeq === expected.map(_._1))
    assert(got.map(_._2).toSeq === expected.map(_._2))
    // classic RRF shapes must occur: a doc found by BOTH legs and docs
    // found by exactly one (else the fusion is vacuous on this corpus)
    val ids = got.map(_._1).toSet
    assert(ids.exists(id => lex.contains(id) && vec.contains(id)))
    assert(ids.exists(id => lex.contains(id) ^ vec.contains(id)))
  }

  test("MMR picks satisfy greedy optimality and the penalty binds") {
    val out = Hybrid.h3MmrRerank(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.length === Hybrid.MmrSelect)

    // independent candidate pool + pairwise sims (engine cosine kernel)
    val q = Knn.embeddingLit(spark, sf0001, Knn.QueryId)
    val cand = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") =!= Knn.QueryId)
      .select(col("vec_id"), cosine(col("embedding"), q).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(Hybrid.MmrCand)
      .select(col("vec_id"), round(col("sim") * 1000, 0).cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val candIds = cand.map(_._1).toSet
    val e = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id").isin(candIds.toSeq: _*))
    val sim = e.select(col("vec_id").as("a"), col("embedding").as("ea"))
      .crossJoin(e.select(col("vec_id").as("b"), col("embedding").as("eb")))
      .filter(col("a") =!= col("b"))
      .select(col("a"), col("b"),
        round(cosine(col("ea"), col("eb")) * 1000, 0).cast("long")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val rel = cand.toMap

    // optimality: pick k's marginal score ≥ every not-yet-selected
    // alternative's, with the (score desc, id asc) tiebreak
    val lam = Hybrid.MmrLambdaMilli
    var selected = List.empty[Long]
    out.foreach { case (_, id, relM) =>
      assert(relM === rel(id), s"rel_milli of $id")
      def marginal(c: Long): Long = {
        val pen = if (selected.isEmpty) 0L
                  else selected.map(s => sim((c, s))).max
        lam * rel(c) - (1000 - lam) * pen
      }
      val mine = marginal(id)
      (candIds -- selected - id).foreach { alt =>
        val a = marginal(alt)
        assert(a < mine || (a == mine && id < alt),
          s"pick $id (score $mine) must beat alternative $alt (score $a)")
      }
      selected ::= id
    }
    // the penalty must actually bind: selection order differs from the
    // pure-relevance order over the same picks
    val byRel = out.map(t => (t._2, t._3)).sortBy { case (id, r) => (-r, id) }
    assert(out.map(_._2).toSeq !== byRel.map(_._1).toSeq,
      "fixture must exercise diversification, not just relevance order")
  }

  test("single-leg docs score with the leg they have (from h2's output)") {
    val rows = Hybrid.h2HybridRrf(spark, sf0001).collect()
    val one = rows.filter(r => r.isNullAt(1) ^ r.isNullAt(2))
    assert(one.nonEmpty, "corpus must produce single-leg fusion rows")
    one.foreach { r =>
      val rank = if (r.isNullAt(1)) r.getLong(2) else r.getLong(1)
      assert(r.getLong(3) === Hybrid.RrfScale / (Hybrid.RrfC + rank))
    }
    val both = rows.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    both.foreach { r =>
      assert(r.getLong(3) ===
        Hybrid.RrfScale / (Hybrid.RrfC + r.getLong(1)) +
          Hybrid.RrfScale / (Hybrid.RrfC + r.getLong(2)))
    }
  }
}

package graft

import graft.functions.RepetitionKernel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RepetitionStats kernel ≡ the explode + window + three-aggregation
  * formulation it replaces — all five integers, row-for-row, over both
  * fixture corpora and the tokenization edge cases the parity notes
  * call out (the Shingles3 edge set plus repetition-specific shapes:
  * uniform runs, single dominant bigram, alternating tokens).
  */
class RepetitionKernelSpec extends SparkSuite {

  /** The original multi-pass formulation, kept here verbatim as the
    * oracle (`Corpus.t15Repetition` now delegates to the kernel).
    * Nulls that the old plan expressed via the left join + `when`
    * guard are normalized to the kernel's 0 here, matching the final
    * projected semantics (`top_bigram_frac` = 0 when no bigrams).
    */
  private def oldStats(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("pos", "tok")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val prev = lag("tok", 1).over(w)
    val runs = toks
      .withColumn("brk", when(prev.isNull || prev =!= col("tok"), 1).otherwise(0))
      .withColumn("run_id", sum("brk").over(w))
    val maxRun = runs.groupBy("doc_id", "run_id").agg(count(lit(1)).as("rl"))
      .groupBy("doc_id").agg(max("rl").as("max_run"))
    val tokStats = toks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), countDistinct("tok").as("n_distinct"))
    val t = split(lower(trim(col("text"))), "\\s+")
    val n1 = greatest(size(t) - 1, lit(0))
    val bg = zip_with(slice(t, lit(1), n1), slice(t, lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
    val bgStats = docs.select(col("doc_id"), explode(bg).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_bg"), sum("c").as("n_bg"))
    tokStats.join(maxRun, "doc_id").join(bgStats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"), col("max_run"),
        coalesce(col("top_bg"), lit(0L)).as("top_bg"),
        coalesce(col("n_bg"), lit(0L)).as("n_bg"))
  }

  private def kernelStats(docs: DataFrame): DataFrame =
    docs.where(col("text").isNotNull)
      .select(col("doc_id"),
        RepetitionKernel.repetitionStats(col("text")).as("r"))
      .select(col("doc_id"), col("r.n_tokens"), col("r.n_distinct"),
        col("r.max_run"), col("r.top_bg"), col("r.n_bg"))

  private def assertEquiv(docs: DataFrame): Unit = {
    val o = oldStats(docs)
    val k = kernelStats(docs)
    assert(o.count() == k.count(), "row counts diverge")
    val fields = Seq("n_tokens", "n_distinct", "max_run", "top_bg", "n_bg")
    val diff = o.as("o").join(k.as("k"), "doc_id")
      .filter(fields.map(f => col(s"o.$f") =!= col(s"k.$f")).reduce(_ || _))
      .collect()
    assert(diff.isEmpty,
      s"kernel diverged on ${diff.length} rows, first: ${diff.headOption}")
  }

  test("kernel == multi-pass plan on both fixture corpora") {
    assertEquiv(spark.read.parquet(s"$sf0001/documents.parquet"))
    assertEquiv(spark.read.parquet("/root/testdata/sf0.01/documents.parquet"))
  }

  test("kernel == multi-pass plan on edge cases") {
    import spark.implicits._
    val edges = Seq(
      "",                            // empty → split yields [""]: 1 token
      "   ",                         // spaces only → same
      "one",                         // single token, no bigrams
      "one two",                     // one bigram
      "a a a a a",                   // uniform run: max_run = n
      "a b a b a b",                 // alternating: max_run 1, dominant bigrams
      "x x y y y x",                 // mixed runs
      "\tlead tab one two\t",        // edge tabs survive the space-only trim
      "A B a b",                     // lowercasing folds distinct
      "İstanbul ĞÜ şi ıı İs",        // non-ASCII case mapping
      "x  y\n z \r\n w",             // mixed multi-whitespace separators
      ("spam " * 200).trim)          // long uniform doc
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    assertEquiv(edges)
  }

  test("null text drops the row, matching the old explode") {
    import spark.implicits._
    val docs = Seq((1L, Option("a b")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    assert(kernelStats(docs).count() == 1)
    assert(oldStats(docs).count() == 1)
  }
}

package graft

import graft.functions.ShingleKernel
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Shingles3 kernel ≡ the HOF chain it replaces — element-for-element
  * (same shingles, same first-occurrence order), over both fixture
  * corpora and the tokenization edge cases the parity notes call out.
  */
class ShingleKernelSpec extends SparkSuite {

  /** The original HOF formulation, kept here verbatim as the oracle
    * (`Dedup.shingles` now delegates to the kernel).
    */
  private def hofShingles(text: org.apache.spark.sql.Column) = {
    val toks = split(lower(trim(text)), "\\s+")
    def sl(off: Int) = slice(toks, lit(off), greatest(size(toks) - 2, lit(0)))
    array_distinct(
      zip_with(
        zip_with(sl(1), sl(2), (a, b) => concat(a, lit(" "), b)),
        sl(3), (ab, c) => concat(ab, lit(" "), c)))
  }

  private def assertEquiv(df: org.apache.spark.sql.DataFrame): Unit = {
    val diff = df
      .select(col("text"),
        hofShingles(col("text")).as("hof"),
        ShingleKernel.shingles3(col("text")).as("kernel"))
      .filter(not(col("hof") === col("kernel")))
      .collect()
    assert(diff.isEmpty, s"kernel diverged on ${diff.length} rows, first: " +
      diff.headOption.map(r => s"text=${r.getString(0).take(80)} hof=${r.getSeq[String](1)} kernel=${r.getSeq[String](2)}"))
  }

  test("kernel == HOF on both fixture corpora") {
    assertEquiv(spark.read.parquet(s"$sf0001/documents.parquet"))
    assertEquiv(spark.read.parquet("/root/testdata/sf0.01/documents.parquet"))
  }

  test("kernel == HOF on whitespace and unicode edges") {
    import spark.implicits._
    val edges = Seq(
      "",                       // empty → no shingles
      "   ",                    // spaces only
      "one",                    // under 3 tokens
      "one two",
      "one two three",          // exactly one shingle
      "a b c a b c a b c",      // repeated shingles → distinct keeps first
      "\tlead tab one two three\t",  // tabs survive the space-only trim
      "a b c d e",         // NBSP is not regex \s — stays inside a token
      "A B C D",                // lowercasing
      "İstanbul ĞÜ şi ıı İs",   // non-ASCII case mapping
      "x  y\n z \r\n w",        // mixed multi-whitespace separators
      "word " * 100)            // long repeat → one distinct shingle
    assertEquiv(edges.toDF("text"))
  }
}

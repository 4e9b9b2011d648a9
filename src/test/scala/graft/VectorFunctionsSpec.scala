package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** Kernel correctness: codegen Expression ≡ HOF composition ≡ plain
  * Scala reference formula (`/root/reference/src/database.ts:218-220`),
  * plus the index_nr_to_string byte-parity and its ≥1.0 ordering quirk
  * (SURVEY §1.4). Property-style with a fixed seed (cross-JVM stable).
  */
class VectorFunctionsSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def vec(n: Int = 16): List[Float] =
    List.fill(n)(rnd.nextFloat() * 2 - 1)

  private def refEuclidean(a: Seq[Float], b: Seq[Float]): Double =
    math.sqrt(a.zip(b).map { case (x, y) =>
      val d = x.toDouble - y.toDouble; d * d
    }.sum)

  test("euclidean codegen == HOF == reference formula (100 random pairs)") {
    val pairs = List.fill(100)((vec(), vec()))
    val rows = pairs.toDF("a", "b")
      .select(euclidean($"a", $"b"), euclideanHof($"a", $"b")).collect()
    pairs.zip(rows).foreach { case ((a, b), r) =>
      val expect = refEuclidean(a, b)
      assert(math.abs(r.getDouble(0) - expect) < 1e-12)
      assert(r.getDouble(0) === r.getDouble(1)) // bit-identical paths
    }
  }

  test("sq8Dist2 codegen == HOF == plain Scala (100 random int-code pairs)") {
    def codes(): List[Int] = List.fill(16)(rnd.nextInt(256))
    val pairs = List.fill(100)((codes(), codes()))
    val rows = pairs.toDF("a", "b")
      .select(sq8Dist2($"a", $"b"), sq8Dist2Hof($"a", $"b")).collect()
    pairs.zip(rows).foreach { case ((a, b), r) =>
      val expect = a.zip(b).map { case (x, y) => val d = (x - y).toLong; d * d }.sum
      assert(r.getLong(0) === expect)
      assert(r.getLong(0) === r.getLong(1))
    }
  }

  test("cosine and dot agree between codegen and HOF (100 random pairs)") {
    val pairs = List.fill(100)((vec(), vec()))
    val rows = pairs.toDF("a", "b")
      .select(cosine($"a", $"b"), cosineHof($"a", $"b"), dot($"a", $"b")).collect()
    pairs.zip(rows).foreach { case ((a, b), r) =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
      val expectDot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      assert(math.abs(r.getDouble(2) - expectDot) < 1e-12)
    }
  }

  test("distance metric properties: symmetry, identity, triangle (100 triples)") {
    val triples = List.fill(100)((vec(), vec(), vec()))
    val rows = triples.toDF("a", "b", "c").select(
      euclidean($"a", $"b"), euclidean($"b", $"a"), euclidean($"a", $"a"),
      euclidean($"a", $"c"), euclidean($"c", $"b")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1))
      assert(r.getDouble(2) === 0.0)
      assert(r.getDouble(0) <= r.getDouble(3) + r.getDouble(4) + 1e-9)
    }
  }

  test("null-safe: null array yields null distance") {
    val df = Seq((Some(Seq(1f, 2f)), None: Option[Seq[Float]])).toDF("a", "b")
    val r = df.select(euclidean($"a", $"b")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("l2Normalize produces unit vectors") {
    val df = Seq(Tuple1(Seq(3f, 4f))).toDF("a")
    val r = df.select(dot(l2Normalize($"a"), l2Normalize($"a"))).head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-6)
  }

  /** Reference: indexNrToString(nr) = ((nr*10)+'').slice(0,10).padEnd(10,'0')
    * (`src/database.ts:223-225`).
    */
  private def refIndexNrToString(nr: Double): String = {
    val s = (nr * 10).toString
    s.take(10).padTo(10, '0')
  }

  test("index_nr_to_string byte parity on [0,1) and quirk witness at >=1.0") {
    val vals = Seq(0.0, 0.1234567, 0.8473, 0.99999)
    val got = vals.toDF("nr").select(indexNrToString($"nr")).as[String].collect()
    vals.zip(got).foreach { case (v, g) =>
      assert(g === refIndexNrToString(v), s"for $v")
      assert(g.length === 10)
    }
    // quirk witness: lexicographic order breaks across the 1-digit/2-digit
    // boundary (1.05 -> "10.5000000" sorts BELOW 0.95 -> "9.50000000")
    val quirky = Seq(0.95, 1.05).toDF("nr")
      .select(indexNrToString($"nr")).as[String].collect()
    assert(quirky(0) > quirky(1), "reference quirk must be observable")
  }
}

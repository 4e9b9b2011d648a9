package graft

import graft.functions.{CosineSimilarity, DotProduct, EuclideanDistance}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the engine's Catalyst expressions as
  * SQL functions, so the surface is reachable from `spark.sql(...)` as
  * well as the Column API:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   ...
  * spark.sql("SELECT euclidean_distance(a.embedding, b.embedding) ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("euclidean_distance"),
      new ExpressionInfo(classOf[EuclideanDistance].getName, null, "euclidean_distance"),
      (args: Seq[Expression]) => EuclideanDistance(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, null, "cosine_similarity"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, null, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[graft.functions.SimHash32].getName, null, "simhash32"),
      (args: Seq[Expression]) => graft.functions.SimHash32(args(0))))
    e.injectFunction((
      FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[graft.functions.KmvSketchAgg].getName, null, "kmv_sketch"),
      (args: Seq[Expression]) => {
        if (args.length != 2) throw new IllegalArgumentException(
          s"kmv_sketch expects exactly 2 arguments (hash column, k), got ${args.length}")
        // k must be a foldable positive integer — this is an index-time
        // sketch parameter, not a per-row value
        val k = args(1) match {
          case e if e.foldable => e.eval() match {
            case i: Int if i > 0 => i
            case other => throw new IllegalArgumentException(
              s"kmv_sketch k must be a positive INT literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "kmv_sketch k must be a literal")
        }
        graft.functions.KmvSketchAgg(args(0), k)
      }))
  }
}

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

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[EuclideanDistance].getName, null, name)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("euclidean_distance"),
      info("euclidean_distance", "euclidean_distance(a, b) - sqrt(sum((a_i-b_i)^2)) over two float arrays"),
      (args: Seq[Expression]) => EuclideanDistance(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - dot(a,b)/(|a||b|) over two float arrays"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - sum(a_i*b_i) over two float arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
  }
}

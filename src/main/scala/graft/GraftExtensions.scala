package graft

import graft.functions.{DotProduct, KmvDistinct, WordShingles}

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql` users get them too:
  *
  *   SELECT dot_product(a.vec, b.vec), word_shingles(text, 3) FROM ...
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product(arrA, arrB)")
        DotProduct(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "word_shingles(text, n)")
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other =>
            throw new IllegalArgumentException(
              s"word_shingles n must be a literal, got $other")
        }
        WordShingles(args(0), n)
      }))
    ext.injectFunction((
      new FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[KmvDistinct].getName, "kmv_distinct"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kmv_distinct(col, k)")
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other =>
            throw new IllegalArgumentException(
              s"kmv_distinct k must be a literal, got $other")
        }
        KmvDistinct(args(0), k).toAggregateExpression()
      }))
  }
}

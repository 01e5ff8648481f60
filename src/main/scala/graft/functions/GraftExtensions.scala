package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions injection point for the engine's native
  * expressions — enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or call [[GraftExtensions.registerAll]] on an existing session.
  * After registration the functions are first-class in SQL text:
  * `SELECT graft_cosine(a.embedding, b.embedding) ...`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineDescriptor)
    ext.injectOptimizerRule(_ => CosineSelfSimilarityRule)
  }
}

object GraftExtensions {
  private[functions] val cosineDescriptor = (
    new FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2, "graft_cosine expects exactly 2 arguments")
      CosineSimilarity(children.head, children(1))
    })

  /** Register on a live session (tests / REPL). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (ident, info, builder) = cosineDescriptor
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}

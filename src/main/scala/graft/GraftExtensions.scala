package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's custom
  * Catalyst expressions with the session function registry, making
  * them available to SQL texts as well as the DataFrame API
  * (`spark.sql("SELECT graft_dot(a, b) ...")`).
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  * The DataFrame-API path ([[graft.llm.Similarity.dot]]) does NOT
  * require the extension — it builds the expression directly — so a
  * session without it still runs every catalog query.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[graft.expr.DotProduct].getName, "graft_dot"),
        (exprs: Seq[Expression]) => graft.expr.DotProduct(exprs(0), exprs(1)),
      )
    )
  }
}

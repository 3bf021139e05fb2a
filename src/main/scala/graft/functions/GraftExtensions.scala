package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration for the engine's native expressions
  * (SURVEY §7.3 custom-operator tier (c): register via
  * SparkSessionExtensions). Two ways in:
  *
  *   - config: `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  *     at session build time;
  *   - runtime: `GraftExtensions.register(spark)` on an existing session
  *     (the driver owns session construction in some deployments).
  *
  * Either way `SELECT cosine_similarity(a, b)` works in plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.cosineEntry)
}

object GraftExtensions {
  private val cosineEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "cosine_similarity takes exactly 2 arguments")
      CosineSimilarity(children.head, children(1))
    })

  /** Runtime registration on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.GraftExpressionBridge.registerFunction(
      spark, cosineEntry._1, cosineEntry._2, cosineEntry._3)
}

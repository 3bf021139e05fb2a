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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineEntry)
    ext.injectFunction(GraftExtensions.cleanEntry)
  }
}

object GraftExtensions {
  private val cosineEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "cosine_similarity takes exactly 2 arguments")
      CosineSimilarity(children.head, children(1))
    })

  private val cleanEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("clean_text"),
    new ExpressionInfo(classOf[CleanText].getName, "clean_text"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "clean_text takes exactly 1 argument")
      CleanText(children.head)
    })

  /** Runtime registration on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val b = org.apache.spark.sql.GraftExpressionBridge
    b.registerFunction(spark, cosineEntry._1, cosineEntry._2, cosineEntry._3)
    b.registerFunction(spark, cleanEntry._1, cleanEntry._2, cleanEntry._3)
  }
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, RhpSignature}

/** Session extension point: makes the engine's native functions available
  * to ANY session (SQL included) via
  * `spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)` — no
  * per-session register() calls.
  *
  * This is tier (b)/(c) of the customization ladder (custom Expression,
  * injected through SparkSessionExtensions). No custom LogicalPlan /
  * SparkStrategy ships deliberately: every operator the reference can
  * express maps onto Catalyst plans that already carry the right
  * physical strategies (see SURVEY.md §4 — e.g. Spark 4 plans per-group
  * top-k as WindowGroupLimit, so a custom TopK operator would duplicate
  * built-in machinery).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("rhp_signature"),
      new ExpressionInfo(classOf[RhpSignature].getName, "rhp_signature"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "rhp_signature takes exactly 1 argument")
        RhpSignature(exprs.head)
      }))
  }
}

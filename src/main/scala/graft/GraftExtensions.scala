package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Library entry point for externally-built sessions:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects every graft function into the session's catalog, so pure-SQL
  * users (`SELECT graft_cosine(a.embedding, b.embedding) ...`) get the
  * same codegen'd expressions as the Scala API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    Graft.functionBuilders.foreach { case (name, builder) =>
      extensions.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    // inert unless spark.graft.rangejoin.bucket is set — see RangeJoinRule
    extensions.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
    // plans graft.plans.AsOfJoin nodes; inert on every other plan
    extensions.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

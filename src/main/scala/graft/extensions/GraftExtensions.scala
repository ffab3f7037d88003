package graft.extensions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{DotProduct, DotProductRewrite}

/** Engine extension point, registered at session creation via
  * `.config("spark.sql.extensions", "graft.extensions.GraftExtensions")`
  * (or `.withExtensions(new GraftExtensions)`):
  *
  *  - `graft_dot(a, b)` SQL function → the codegen'd [[DotProduct]]
  *    expression, so SQL users get the native path directly;
  *  - [[DotProductRewrite]] optimizer rule, so the idiomatic-but-
  *    interpreted `aggregate(zip_with(...))` dot/norm² lambdas are
  *    transparently rewritten onto the same native expression.
  *
  * This is the Spark-sanctioned way to ship engine features without
  * forking: injection happens per-session, composes with other
  * extensions, and leaves Catalyst in charge of when the rule fires.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot expects exactly 2 arguments")
        DotProduct(args.head, args(1))
      }))
    ext.injectOptimizerRule(_ => DotProductRewrite)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.AsOfJoinStrategy)
  }
}

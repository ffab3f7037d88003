package graft.extensions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{DotProduct, DotProductRewrite, MinhashMins, Ngrams, Segments, SimHash64}

/** Engine extension point, registered at session creation via
  * `.config("spark.sql.extensions", "graft.extensions.GraftExtensions")`
  * (or `.withExtensions(new GraftExtensions)`):
  *
  *  - SQL functions → the codegen'd native expressions, so SQL-surface
  *    users reach the same primitives the DataFrame ops run on:
  *    `graft_dot(a, b)` ([[DotProduct]]), `graft_ngrams(text, n,
  *    distinct)` ([[Ngrams]] — `graft_ngrams(text, 3, true)` is the
  *    engine's near-dup shingle set), `graft_minhash(text, k)`
  *    ([[MinhashMins]] — the k-permutation signature the LSH banding
  *    buckets on), `graft_simhash64(text)` ([[SimHash64]]),
  *    `graft_segments(text, width)` ([[Segments]] — the segment-dedup
  *    tokenization). The shape knobs (n/distinct/k/width) are part of
  *    the expression's CODEGEN, so they must be literals — a loud
  *    analysis-time refusal, not a per-row branch;
  *  - [[DotProductRewrite]] optimizer rule, so the idiomatic-but-
  *    interpreted `aggregate(zip_with(...))` dot/norm² lambdas are
  *    transparently rewritten onto the same native expression.
  *
  * This is the Spark-sanctioned way to ship engine features without
  * forking: injection happens per-session, composes with other
  * extensions, and leaves Catalyst in charge of when the rule fires.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be an integer literal")
    e.eval() match {
      case i: java.lang.Integer => i.intValue
      case l: java.lang.Long =>
        // refuse, don't narrow: a BIGINT literal outside Int range would
        // silently wrap (graft_ngrams(text, 2^33+3, …) running as n=3) —
        // shape knobs fail loudly at analysis time, never truncate
        require(l.longValue >= Int.MinValue && l.longValue <= Int.MaxValue,
          s"$what out of Int range: $l")
        l.intValue
      case s: java.lang.Short => s.intValue
      case b: java.lang.Byte => b.intValue
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  }

  private def litBool(e: Expression, what: String): Boolean = {
    require(e.foldable, s"$what must be a boolean literal")
    e.eval() match {
      case b: java.lang.Boolean => b.booleanValue
      case other => throw new IllegalArgumentException(
        s"$what must be a boolean literal, got $other")
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot expects exactly 2 arguments")
        DotProduct(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[Ngrams].getName, "graft_ngrams"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_ngrams(text, n, distinct) expects exactly 3 arguments")
        Ngrams(args.head, litInt(args(1), "graft_ngrams n"),
          litBool(args(2), "graft_ngrams distinct"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinhashMins].getName, "graft_minhash"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_minhash(text, k) expects exactly 2 arguments")
        MinhashMins(args.head, litInt(args(1), "graft_minhash k"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          "graft_simhash64(text) expects exactly 1 argument")
        SimHash64(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_segments"),
      new ExpressionInfo(classOf[Segments].getName, "graft_segments"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_segments(text, width) expects exactly 2 arguments")
        Segments(args.head, litInt(args(1), "graft_segments width"))
      }))
    ext.injectOptimizerRule(_ => DotProductRewrite)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.AsOfJoinStrategy)
  }
}

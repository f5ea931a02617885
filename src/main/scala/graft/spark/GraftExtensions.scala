package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/**
 * Session-extension registration of the engine's native Catalyst
 * expressions as GLOBAL SQL functions — the `SparkSessionExtensions`
 * seam, so any session configured with
 *
 * {{{
 *   spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions
 * }}}
 *
 * can call `graft_jaccard_milli(a, b)`, `graft_dot(x, y)`,
 * `graft_token_ngrams(toks, n)` and `graft_lsh_bucket(vec, nbits, t)`
 * in plain SQL with FULL whole-stage-codegen — unlike the V2 catalog
 * function surface (`cat.system.*`), which goes through the per-row
 * `produceResult` interface. Both expose the same arithmetic; this is
 * the hot-path spelling.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other =>
      throw new IllegalArgumentException(s"$what must be an INT literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_jaccard_milli"),
      new ExpressionInfo(classOf[JaccardMilli].getName, "graft_jaccard_milli"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_jaccard_milli(sortedA, sortedB)")
        JaccardMilli(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(a, b)")
        DotProduct(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_token_ngrams"),
      new ExpressionInfo(classOf[TokenNgrams].getName, "graft_token_ngrams"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_token_ngrams(tokens, n)")
        TokenNgrams(args(0), intArg(args(1), "n"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_lsh_bucket"),
      new ExpressionInfo(classOf[LshBucket].getName, "graft_lsh_bucket"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_lsh_bucket(vec, nbits, table)")
        LshBucket(args(0), intArg(args(1), "nbits"), intArg(args(2), "table"))
      }))
  }
}

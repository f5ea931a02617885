package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Space-joined n-gram windows over a token array: evaluates the child
 *  array ONCE per row and slides over it in place. This exists because
 *  the declarative formulation — `transform(sequence(1, size(t)-n+1),
 *  i -> concat_ws(' ', slice(t, i, n)))` — inlines the token subtree
 *  into the lambda, so a `tokens(text)` child is re-evaluated (regex
 *  split + filter) once PER POSITION: measured 3.5x the whole-entry
 *  runtime at sf0.1 and quadratic in doc length. A lambda cannot hoist
 *  its free subexpressions; a unary expression evaluates its child
 *  exactly once by construction. */
case class TokenNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_token_ngrams"

  override protected def nullSafeEval(a: Any): Any =
    TokenNgrams.build(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.TokenNgrams.build($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): TokenNgrams =
    copy(child = newChild)
}

object TokenNgrams {
  private val Sep = UTF8String.fromString(" ")

  /** static so generated code can call it without a references slot */
  def build(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    val out = len - n + 1
    if (out <= 0) return new GenericArrayData(Array.empty[Any])
    val grams = new Array[Any](out)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i < out) {
      var j = 0
      while (j < n) { window(j) = toks.getUTF8String(i + j); j += 1 }
      grams(i) = UTF8String.concatWs(Sep, window: _*)
      i += 1
    }
    new GenericArrayData(grams)
  }

  def asColumn(tokenArray: Column, n: Int): Column =
    ExpressionUtils.column(TokenNgrams(
      ExpressionUtils.expression(tokenArray), n))
}

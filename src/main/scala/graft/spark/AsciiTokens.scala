package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The tokenizer kernel: maximal ASCII-alphanumeric runs of a string,
 *  as one byte scan. Bit-equal to
 *  `filter(split(c, "[^a-zA-Z0-9]+"), t => t =!= "")` — the token
 *  class is ASCII-only, and every byte of a multi-byte UTF-8 codepoint
 *  has the high bit set, so a byte-level scan can never split inside a
 *  codepoint: non-ASCII is separator bytes either way. Java-callable
 *  (top-level object → static forwarders) so generated code calls it
 *  directly. */
object AsciiTokensKernel {
  @inline private def isAlnum(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')

  /** `lower = true` additionally maps A-Z → a-z byte-wise in the
   *  emitted tokens. That makes `split(s, true)` bit-equal to
   *  `tokens(normalize(s))` (the regex-replace → unicode-lower → split
   *  pipeline): normalize kills every non-[a-zA-Z0-9] codepoint BEFORE
   *  its `lower`, so the only characters unicode lowercasing ever sees
   *  there are ASCII — exotic lower-to-ASCII mappings (e.g. Kelvin
   *  K → k) can never manufacture a token byte. */
  def split(s: UTF8String, lower: Boolean): ArrayData = {
    val b = s.getBytes
    val n = b.length
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < n) {
      if (isAlnum(b(i))) {
        var j = i + 1
        while (j < n && isAlnum(b(j))) j += 1
        val t = java.util.Arrays.copyOfRange(b, i, j)
        if (lower) {
          var k = 0
          while (k < t.length) {
            if (t(k) >= 'A' && t(k) <= 'Z') t(k) = (t(k) + 32).toByte
            k += 1
          }
        }
        out.add(UTF8String.fromBytes(t))
        i = j
      } else i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }

  /** Normalized form in the same scan: lowered alnum bytes, interior
   *  separator runs → one space, outer separators dropped. */
  def normalize(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val n = b.length
    val out = new Array[Byte](n)
    var p = 0
    var i = 0
    var pendingSpace = false
    while (i < n) {
      val c = b(i)
      if (isAlnum(c)) {
        if (pendingSpace && p > 0) { out(p) = ' '; p += 1 }
        pendingSpace = false
        out(p) = if (c >= 'A' && c <= 'Z') (c + 32).toByte else c
        p += 1
      } else pendingSpace = true
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, p))
  }
}

/** `graft_ascii_tokens(str)` — the `TextOps.tokens` primitive every
 *  text operator runs, as a codegen'd single-pass expression: the
 *  previous `split(regex)` + interpreted `filter` lambda paid a full
 *  regex pass plus one expression-tree interpretation per token, per
 *  document — on the operator family whose first stage touches every
 *  byte of a 100-TB corpus. Null input → null (the split/filter
 *  pipeline's propagation). */
case class AsciiTokens(child: Expression, lowerAscii: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ascii_tokens"

  override protected def nullSafeEval(input: Any): Any =
    AsciiTokensKernel.split(input.asInstanceOf[UTF8String], lowerAscii)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = org.apache.spark.sql.graft.AsciiTokensKernel.split($a, $lowerAscii);"
    })

  override protected def withNewChildInternal(newChild: Expression): AsciiTokens =
    copy(child = newChild)
}

/** `graft_ascii_normalize(str)` — `TextOps.normalize` as the same
 *  single byte scan: alnum runs lowered byte-wise, separator runs
 *  collapsed to one interior space, leading/trailing separators
 *  dropped. Bit-equal to `trim(lower(regexp_replace(c, pat, " ")))`:
 *  after the replace the string holds only [a-zA-Z0-9 ], so the
 *  pipeline's unicode `lower` only ever lowercases ASCII. */
case class AsciiNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ascii_normalize"

  override protected def nullSafeEval(input: Any): Any =
    AsciiTokensKernel.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = org.apache.spark.sql.graft.AsciiTokensKernel.normalize($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): AsciiNormalize =
    copy(child = newChild)
}

object AsciiNormalize {
  def asColumn(str: Column): Column =
    ExpressionUtils.column(AsciiNormalize(ExpressionUtils.expression(str)))
}

object AsciiTokens {
  def asColumn(str: Column): Column =
    ExpressionUtils.column(AsciiTokens(ExpressionUtils.expression(str)))

  /** Fused `tokens(normalize(str))`: lowercased token extraction in the
   *  same single byte scan — no regex pass at all on the dedup
   *  family's first corpus stage. */
  def normColumn(str: Column): Column =
    ExpressionUtils.column(
      AsciiTokens(ExpressionUtils.expression(str), lowerAscii = true))
}

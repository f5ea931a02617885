package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** MinHash signature over a hashed-shingle set: `numHashes` seeded
 *  splitmix64 rehash minima computed in one tight primitive loop —
 *  identical arithmetic to the Scala UDF it replaces
 *  (`Dedup.minhashSignature`): sig[h] = min over shingles x of
 *  mix64(x ^ (h * 0x9E3779B97F4A7C15)). Reads the `ArrayData` in
 *  place and stays inside whole-stage codegen, removing the
 *  catalyst→Seq boxing that dominated the hottest dedup scan
 *  (numHashes × shingles evals per document). Null input → null.
 *
 *  MinHash over word shingles is the dedup scheme of the reference's
 *  domain (GPT-3/Gopher-style corpus dedup); the reference engine
 *  itself has no text operators — this extends the Spark surface. */
case class MinhashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = hs.getLong(i)
      var h = 0
      while (h < numHashes) {
        var z = (x ^ (h * 0x9E3779B97F4A7C15L)) + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^= (z >>> 31)
        if (z < sig(h)) sig(h) = z
        h += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val i = ctx.freshName("i"); val h = ctx.freshName("h")
      val x = ctx.freshName("x"); val z = ctx.freshName("z")
      s"""
         |final int $n = $a.numElements();
         |final long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $x = $a.getLong($i);
         |  for (int $h = 0; $h < $numHashes; $h++) {
         |    long $z = ($x ^ ($h * 0x9E3779B97F4A7C15L)) + 0x9E3779B97F4A7C15L;
         |    $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |    $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |    $z ^= ($z >>> 31);
         |    if ($z < $sig[$h]) $sig[$h] = $z;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {
  def asColumn(hs: Column, numHashes: Int): Column =
    ExpressionUtils.column(MinhashSig(ExpressionUtils.expression(hs), numHashes))
}

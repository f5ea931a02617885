package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** Exact Jaccard similarity in integer milli-units over two SORTED
 *  arrays of distinct non-null ints (dictionary-encoded shingle sets —
 *  see `Dedup.jaccardPairs`): single merge pass counts the
 *  intersection, then floor(1000*i/u) with u = |A|+|B|-i, the exact
 *  arithmetic of `Dedup.jaccardMilli` and the SQL oracle. Null if
 *  either array is null. Reads `ArrayData` in place — a pair scan
 *  allocates nothing, where the UDF it replaces paid two
 *  catalyst→Scala `Seq` conversions per call.
 *
 *  Declared NONDETERMINISTIC although pure, to pin the plan: a
 *  deterministic projection gets substituted into the join-side filter
 *  by predicate pushdown, re-running the O(|A|+|B|) merge once in the
 *  join condition and once in the projection for every surviving pair
 *  (the r6 double-eval regression). The flag blocks that rewrite, so
 *  the merge runs EXACTLY once per pair. */
case class JaccardMilli(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jaccard_milli"
  override lazy val deterministic: Boolean = false

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0; var j = 0; var inter = 0L
    while (i < nx && j < ny) {
      val va = x.getInt(i); val vb = y.getInt(j)
      if (va == vb) { inter += 1L; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    val uni = nx.toLong + ny.toLong - inter
    if (uni == 0L) 0L else math.floor(1000.0 * inter / uni).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val va = ctx.freshName("va"); val vb = ctx.freshName("vb")
      val inter = ctx.freshName("inter"); val uni = ctx.freshName("uni")
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $inter = 0L;
         |while ($i < $nx && $j < $ny) {
         |  final int $va = $a.getInt($i);
         |  final int $vb = $b.getInt($j);
         |  if ($va == $vb) { $inter++; $i++; $j++; }
         |  else if ($va < $vb) { $i++; } else { $j++; }
         |}
         |final long $uni = (long) $nx + (long) $ny - $inter;
         |${ev.value} = ($uni == 0L) ? 0L : (long) Math.floor(1000.0 * $inter / $uni);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardMilli =
    copy(left = newLeft, right = newRight)
}

object JaccardMilli {
  def asColumn(a: Column, b: Column): Column =
    ExpressionUtils.column(JaccardMilli(
      ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))
}

/** [[JaccardMilli]] over SORTED arrays of distinct non-null LONGS (the
 *  64-bit hashed-shingle sets of `Dedup.hashedShingles`) — identical
 *  merge, arithmetic, plan-pinning rationale. Used by the dedup
 *  verification stage, where the `array_intersect` form it replaces
 *  built a hash set per candidate PAIR. */
case class JaccardMilliLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jaccard_milli_long"
  override lazy val deterministic: Boolean = false

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0; var j = 0; var inter = 0L
    while (i < nx && j < ny) {
      val va = x.getLong(i); val vb = y.getLong(j)
      if (va == vb) { inter += 1L; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    val uni = nx.toLong + ny.toLong - inter
    if (uni == 0L) 0L else math.floor(1000.0 * inter / uni).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val va = ctx.freshName("va"); val vb = ctx.freshName("vb")
      val inter = ctx.freshName("inter"); val uni = ctx.freshName("uni")
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $inter = 0L;
         |while ($i < $nx && $j < $ny) {
         |  final long $va = $a.getLong($i);
         |  final long $vb = $b.getLong($j);
         |  if ($va == $vb) { $inter++; $i++; $j++; }
         |  else if ($va < $vb) { $i++; } else { $j++; }
         |}
         |final long $uni = (long) $nx + (long) $ny - $inter;
         |${ev.value} = ($uni == 0L) ? 0L : (long) Math.floor(1000.0 * $inter / $uni);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardMilliLong =
    copy(left = newLeft, right = newRight)
}

object JaccardMilliLong {
  def asColumn(a: Column, b: Column): Column =
    ExpressionUtils.column(JaccardMilliLong(
      ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))
}

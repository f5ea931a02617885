package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/**
 * Codegen'd ANN corpus-scan kernels (VERDICT r10 item 3's second half):
 * the IVF assignment and PQ encode/ADC paths ran as Scala UDFs, paying
 * a catalyst→Seq conversion plus boxing per corpus row on exactly the
 * scans that touch EVERY vector at 100 TB. Each expression below is
 * bit-identical arithmetic to the UDF it replaces (same strictly
 * left-to-right IEEE folds, same strict-inequality tie-breaks), so all
 * staged two-stage oracles keep hashing identically; the retained UDFs
 * serve as spec oracles (OperatorsSpec equivalence tests).
 *
 * The model matrices (centroids / codebooks / ADC tables) ride the
 * expression as plan constants: Spark broadcasts each stage's task
 * binary once per executor, which is the same distribution a manual
 * `sc.broadcast` handle bought, without the driver round-trip. They are
 * bounded driver-side artifacts (nCells×dim, m×nCodes×subDim,
 * nQueries×m×nCodes) — never data-scale.
 *
 * Vectors are assumed element-non-null (the corpus contract everywhere
 * in `operators/Similarity.scala`); a null array row yields null.
 */
case class NearestCells(child: Expression,
    cents: Array[Array[Double]], topN: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_cells"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toDoubleArray()
    val nc = cents.length
    val scores = new Array[Double](nc)
    var ci = 0
    while (ci < nc) {
      val ct = cents(ci)
      val m = math.min(ct.length, v.length)
      var s = 0.0; var i = 0
      while (i < m) { s += ct(i) * v(i); i += 1 }
      scores(ci) = s
      ci += 1
    }
    val outN = math.min(topN, nc)
    val out = new Array[Int](outN)
    val used = new Array[Boolean](nc)
    var r = 0
    while (r < outN) {
      var best = -1; var bestS = Double.NegativeInfinity
      ci = 0
      while (ci < nc) {
        if (!used(ci) && (best < 0 || scores(ci) > bestS)) {
          best = ci; bestS = scores(ci)
        }
        ci += 1
      }
      used(best) = true; out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cRef = ctx.addReferenceObj("nearestCents", cents, "double[][]")
      val v = ctx.freshName("v"); val nc = ctx.freshName("nc")
      val scores = ctx.freshName("scores"); val ci = ctx.freshName("ci")
      val ct = ctx.freshName("ct"); val m = ctx.freshName("m")
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val outN = ctx.freshName("outN"); val out = ctx.freshName("out")
      val used = ctx.freshName("used"); val r = ctx.freshName("r")
      val best = ctx.freshName("best"); val bestS = ctx.freshName("bestS")
      s"""
         |final double[] $v = $a.toDoubleArray();
         |final int $nc = $cRef.length;
         |final double[] $scores = new double[$nc];
         |for (int $ci = 0; $ci < $nc; $ci++) {
         |  final double[] $ct = $cRef[$ci];
         |  final int $m = Math.min($ct.length, $v.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $m; $i++) $s += $ct[$i] * $v[$i];
         |  $scores[$ci] = $s;
         |}
         |final int $outN = Math.min($topN, $nc);
         |final int[] $out = new int[$outN];
         |final boolean[] $used = new boolean[$nc];
         |for (int $r = 0; $r < $outN; $r++) {
         |  int $best = -1; double $bestS = Double.NEGATIVE_INFINITY;
         |  for (int $ci = 0; $ci < $nc; $ci++) {
         |    if (!$used[$ci] && ($best < 0 || $scores[$ci] > $bestS)) {
         |      $best = $ci; $bestS = $scores[$ci];
         |    }
         |  }
         |  $used[$best] = true; $out[$r] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {
  def asColumn(vec: Column, cents: Array[Array[Double]], topN: Int): Column =
    ExpressionUtils.column(
      NearestCells(ExpressionUtils.expression(vec), cents, topN))
}

/** PQ encode: each `subDim`-slice of the unit-normalized vector maps to
 *  its nearest codebook centroid (squared distance, first-wins ties) —
 *  `Similarity.pqEncode`'s UDF arithmetic, codegen'd. Output: m codes. */
case class PqEncodeCodes(child: Expression, books: Array[Array[Double]],
    m: Int, nCodes: Int, subDim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[ArrayData].toDoubleArray()
    var ss = 0.0; var i = 0
    while (i < u.length) { ss += u(i) * u(i); i += 1 }
    val nrm = math.sqrt(ss)
    val v = if (nrm > 0) {
      val o = new Array[Double](u.length)
      i = 0; while (i < u.length) { o(i) = u(i) / nrm; i += 1 }
      o
    } else u
    val out = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      val base = sub * subDim
      val lim = math.max(0, math.min(subDim, v.length - base))
      var best = 0; var bestD = Double.MaxValue; var code = 0
      while (code < nCodes) {
        val ct = books(sub * nCodes + code)
        var d = 0.0; i = 0
        while (i < lim) { val x = v(base + i) - ct(i); d += x * x; i += 1 }
        if (d < bestD) { bestD = d; best = code }
        code += 1
      }
      out(sub) = best
      sub += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bRef = ctx.addReferenceObj("pqBooks", books, "double[][]")
      val u = ctx.freshName("u"); val ss = ctx.freshName("ss")
      val i = ctx.freshName("i"); val nrm = ctx.freshName("nrm")
      val v = ctx.freshName("v"); val out = ctx.freshName("out")
      val sub = ctx.freshName("sub"); val base = ctx.freshName("base")
      val lim = ctx.freshName("lim"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val code = ctx.freshName("code")
      val ct = ctx.freshName("ct"); val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      s"""
         |final double[] $u = $a.toDoubleArray();
         |double $ss = 0.0;
         |for (int $i = 0; $i < $u.length; $i++) $ss += $u[$i] * $u[$i];
         |final double $nrm = Math.sqrt($ss);
         |double[] $v = $u;
         |if ($nrm > 0) {
         |  $v = new double[$u.length];
         |  for (int $i = 0; $i < $u.length; $i++) $v[$i] = $u[$i] / $nrm;
         |}
         |final int[] $out = new int[$m];
         |for (int $sub = 0; $sub < $m; $sub++) {
         |  final int $base = $sub * $subDim;
         |  final int $lim = Math.max(0, Math.min($subDim, $v.length - $base));
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $code = 0; $code < $nCodes; $code++) {
         |    final double[] $ct = $bRef[$sub * $nCodes + $code];
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $lim; $i++) {
         |      final double $x = $v[$base + $i] - $ct[$i]; $d += $x * $x;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $code; }
         |  }
         |  $out[$sub] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodeCodes =
    copy(child = newChild)
}

object PqEncodeCodes {
  def asColumn(vec: Column, books: Array[Array[Double]],
      m: Int, nCodes: Int, subDim: Int): Column =
    ExpressionUtils.column(PqEncodeCodes(
      ExpressionUtils.expression(vec), books, m, nCodes, subDim))
}

/** ADC lookup-sum: `sum over sub of tabs(qi)(sub*nCodes + codes(sub))`
 *  — the per-row half of `Similarity.pqShortlist*`, m flat-array reads
 *  per row, codegen'd. `tabs` rows are the per-query distance tables
 *  (bounded query batch), indexed by the `qi` child. */
case class PqAdcScore(left: Expression, right: Expression,
    tabs: Array[Array[Double]], nCodes: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(IntegerType, ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc"

  override protected def nullSafeEval(qi: Any, codes: Any): Any = {
    val t = tabs(qi.asInstanceOf[Int])
    val c = codes.asInstanceOf[ArrayData]
    val mm = c.numElements()
    var s = 0.0; var sub = 0
    while (sub < mm) { s += t(sub * nCodes + c.getInt(sub)); sub += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (qi, codes) => {
      val tRef = ctx.addReferenceObj("adcTabs", tabs, "double[][]")
      val t = ctx.freshName("t"); val mm = ctx.freshName("mm")
      val s = ctx.freshName("s"); val sub = ctx.freshName("sub")
      s"""
         |final double[] $t = $tRef[$qi];
         |final int $mm = $codes.numElements();
         |double $s = 0.0;
         |for (int $sub = 0; $sub < $mm; $sub++)
         |  $s += $t[$sub * $nCodes + $codes.getInt($sub)];
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcScore = copy(left = newLeft, right = newRight)
}

object PqAdcScore {
  def asColumn(qi: Column, codes: Column,
      tabs: Array[Array[Double]], nCodes: Int): Column =
    ExpressionUtils.column(PqAdcScore(ExpressionUtils.expression(qi),
      ExpressionUtils.expression(codes), tabs, nCodes))
}

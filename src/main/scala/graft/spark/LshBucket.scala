package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/**
 * Hyperplane coefficient matrices for LSH bucketing, memoized once per
 * executor JVM. Each coefficient is a pure function of (table, plane,
 * element index) — xxhash64-derived values in [-1, 1):
 * `hashInt(i, hashInt(table*nbits+p, 42)) / Long.Max` — so computing
 * the matrix once and reusing it across every row is bit-identical to
 * per-row regeneration, and strictly less work (regeneration paid
 * nbits x dim hash calls PER ROW). The matrix is nbits x dim doubles
 * (a few KB), keyed by dim so ragged corpora stay correct; no
 * driver/broadcast round-trip needed since every executor derives the
 * identical values.
 */
private[graft] object LshPlanes {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()
  def get(nbits: Int, table: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((nbits, table, dim), { _ =>
      Array.tabulate(nbits) { p =>
        val seed = XXH64.hashInt(table * nbits + p, 42L)
        Array.tabulate(dim)(i =>
          XXH64.hashInt(i, seed).toDouble / Long.MaxValue.toDouble)
      }
    })
}

/** The bucket computation as a Java-callable kernel (a top-level
 *  object gets static forwarders, so generated code calls it
 *  directly). Returns null when any element is null — the
 *  null-propagation of the original lambda fold. */
object LshKernel {
  def bucketOrNull(a: ArrayData, nbits: Int, table: Int): java.lang.Long = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    val planes = LshPlanes.get(nbits, table, n)
    var bucket = 0L
    var p = 0
    while (p < nbits) {
      val plane = planes(p)
      var s = 0.0
      i = 0
      while (i < n) { s += a.getDouble(i) * plane(i); i += 1 }
      if (s >= 0) bucket += (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(bucket)
  }
}

/** `nbits`-bit LSH bucket id of a double vector for hash table `table`:
 *  sign bits of dot products with the deterministic LshPlanes
 *  hyperplanes. Reads `ArrayData` in place — no catalyst→Scala Seq
 *  conversion, no per-element boxing. Null array or any null element →
 *  null. Codegen'd since round 11 (previously CodegenFallback): the
 *  generated code hands the already-evaluated ArrayData to the
 *  LshKernel static, so the fallback's per-row boxed `eval(InternalRow)`
 *  dispatch is gone and the enclosing whole-stage span stays fused. */
case class LshBucket(child: Expression, nbits: Int, table: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lsh_bucket"

  override protected def nullSafeEval(v: Any): Any =
    LshKernel.bucketOrNull(v.asInstanceOf[ArrayData], nbits, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("bucket")
      s"""
         |final java.lang.Long $r =
         |  org.apache.spark.sql.graft.LshKernel.bucketOrNull($a, $nbits, $table);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {
  def asColumn(vec: Column, nbits: Int, table: Int): Column =
    ExpressionUtils.column(LshBucket(
      ExpressionUtils.expression(vec.cast("array<double>")), nbits, table))
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/**
 * Codegen'd text-fingerprint kernels — the FIRST corpus pass of every
 * dedup family ran as Scala UDFs over `array<string>` tokens, paying a
 * catalyst→Seq[String] conversion (every token string materialized into
 * a wrapper) per document. Each expression is bit-identical to the UDF
 * it replaces — same FNV/xxhash64 arithmetic, same java.util.HashSet
 * insertion order for the shingle set — so every staged two-stage
 * oracle and hand-computed spec value is unchanged. The UDFs are
 * retained as spec oracles.
 *
 * Token elements are non-null by construction (`TextOps.tokens` filters
 * empties); a null token ARRAY returns null here and is `coalesce`d to
 * the UDFs' null-in-empty-out convention at the call sites.
 */
case class HashedShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hashed_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val len = a.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Long])
    // materialize UTF-16 views once per token (the UDF's Seq[String]
    // did the same, plus a wrapper per element)
    val toks = new Array[String](len)
    var i = 0
    while (i < len) { toks(i) = a.getUTF8String(i).toString; i += 1 }
    val set = new java.util.HashSet[java.lang.Long]()
    i = 0
    val last = len - n
    while (i <= last) {
      var h = 0xCBF29CE484222325L
      var j = 0
      while (j < n) {
        val t = toks(i + j)
        var k = 0
        while (k < t.length) { h = h * 0x100000001B3L + t.charAt(k); k += 1 }
        h = h * 0x100000001B3L + ' '
        j += 1
      }
      set.add(HashedShinglesExpr.mix64(h))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val len = ctx.freshName("len"); val toks = ctx.freshName("toks")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k"); val h = ctx.freshName("h")
      val t = ctx.freshName("t"); val set = ctx.freshName("set")
      val out = ctx.freshName("out"); val it = ctx.freshName("it")
      val p = ctx.freshName("p"); val last = ctx.freshName("last")
      s"""
         |final int $len = $a.numElements();
         |if ($len < $n) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  final String[] $toks = new String[$len];
         |  for (int $i = 0; $i < $len; $i++) $toks[$i] = $a.getUTF8String($i).toString();
         |  /* raw types + explicit casts: Janino erases generics, so a
         |     typed Iterator<Long>.next() resolves to Object and fails
         |     to compile (silent interpreted fallback) */
         |  final java.util.HashSet $set = new java.util.HashSet();
         |  final int $last = $len - $n;
         |  for (int $i = 0; $i <= $last; $i++) {
         |    long $h = 0xCBF29CE484222325L;
         |    for (int $j = 0; $j < $n; $j++) {
         |      final String $t = $toks[$i + $j];
         |      for (int $k = 0; $k < $t.length(); $k++) $h = $h * 0x100000001B3L + $t.charAt($k);
         |      $h = $h * 0x100000001B3L + ' ';
         |    }
         |    $set.add(java.lang.Long.valueOf(org.apache.spark.sql.graft.HashedShinglesExpr.mix64($h)));
         |  }
         |  final long[] $out = new long[$set.size()];
         |  final java.util.Iterator $it = $set.iterator();
         |  int $p = 0;
         |  while ($it.hasNext()) $out[$p++] = ((java.lang.Long) $it.next()).longValue();
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HashedShinglesExpr =
    copy(child = newChild)
}

object HashedShinglesExpr {
  /** splitmix64 finalizer — identical to `Dedup.mix64`. Public static
   *  so the generated Java calls the same code eval() does. */
  def mix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def asColumn(tokens: Column, n: Int): Column =
    ExpressionUtils.column(
      HashedShinglesExpr(ExpressionUtils.expression(tokens), n))
}

/** 64-bit SimHash over a token array: xxhash64(token, seed 42) per
 *  token (bit-identical to Spark's `xxhash64` builtin the old
 *  `transform` produced — XXH64 over the UTF-8 bytes), then a per-bit
 *  majority vote. Replaces an INTERPRETED `transform` lambda (HOFs
 *  don't codegen) feeding a boxed UDF with one codegen'd pass. */
case class SimhashFp(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash_fp"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val len = a.numElements()
    if (len == 0) return 0L
    val votes = new Array[Int](64)
    var i = 0
    while (i < len) {
      val t = a.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val len = ctx.freshName("len"); val votes = ctx.freshName("votes")
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val t = ctx.freshName("t"); val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |final int $len = $a.numElements();
         |long $out = 0L;
         |if ($len > 0) {
         |  final int[] $votes = new int[64];
         |  for (int $i = 0; $i < $len; $i++) {
         |    final org.apache.spark.unsafe.types.UTF8String $t = $a.getUTF8String($i);
         |    final long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $t.getBaseObject(), $t.getBaseOffset(), $t.numBytes(), 42L);
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |    }
         |  }
         |  for (int $b = 0; $b < 64; $b++) if ($votes[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashFp =
    copy(child = newChild)
}

object SimhashFp {
  def asColumn(tokens: Column): Column =
    ExpressionUtils.column(SimhashFp(ExpressionUtils.expression(tokens)))
}

/** Per-term token counts in ONE pass: `terms.length` exact term
 *  frequencies of a token array, replacing k interpreted
 *  `size(filter(toks, _ === term))` lambdas (one walk of the token
 *  array per term, each element eval an expression-tree interpretation)
 *  with a single hashed lookup per token. Output: long[terms.length]
 *  in `terms` order. Null token array → null (call sites guarantee
 *  non-null via `tokens()`). */
case class TermCounts(child: Expression, terms: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_term_counts"

  // UTF8String-keyed index of each term's FIRST occurrence, plus a
  // canonical-slot map so duplicated terms each receive the full count
  // (matching the per-term `size(filter(...))` this replaced — a
  // last-wins HashMap would zero all but one duplicate). Built once
  // per (de)serialized expression instance, shared by eval and codegen
  // via addReferenceObj.
  @transient private lazy val index: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer] = {
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer]()
    terms.zipWithIndex.foreach { case (t, i) =>
      m.putIfAbsent(org.apache.spark.unsafe.types.UTF8String.fromString(t), i) }
    m
  }
  @transient private lazy val canon: Array[Int] = {
    val first = scala.collection.mutable.HashMap.empty[String, Int]
    terms.zipWithIndex.map { case (t, i) =>
      first.getOrElseUpdate(t, i) }.toArray
  }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val counts = new Array[Long](terms.length)
    var i = 0
    while (i < n) {
      val ix = index.get(a.getUTF8String(i))
      if (ix != null) counts(ix) += 1
      i += 1
    }
    val out = new Array[Long](terms.length)
    i = 0
    while (i < terms.length) { out(i) = counts(canon(i)); i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val idxRef = ctx.addReferenceObj("termIndex", index, "java.util.HashMap")
      val canRef = ctx.addReferenceObj("termCanon", canon, "int[]")
      val n = ctx.freshName("n"); val counts = ctx.freshName("counts")
      val i = ctx.freshName("i"); val ix = ctx.freshName("ix")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |final long[] $counts = new long[${terms.length}];
         |for (int $i = 0; $i < $n; $i++) {
         |  final Object $ix = $idxRef.get($a.getUTF8String($i));
         |  if ($ix != null) $counts[((Integer) $ix).intValue()]++;
         |}
         |final long[] $out = new long[${terms.length}];
         |for (int $i = 0; $i < ${terms.length}; $i++) $out[$i] = $counts[$canRef[$i]];
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

object TermCounts {
  def asColumn(tokens: Column, terms: Seq[String]): Column =
    ExpressionUtils.column(TermCounts(ExpressionUtils.expression(tokens), terms))
}

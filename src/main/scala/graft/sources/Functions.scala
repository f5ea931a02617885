package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/**
 * SQL-surface exposure of the engine's native kernels through the V2
 * `FunctionCatalog` (the §2.3 UDF/UDAF surface on its public API):
 *
 *   SELECT cat.system.jaccard_milli(a.hs, b.hs) FROM ...
 *   SELECT cat.system.dot(v1, v2) FROM ...
 *
 * Each function computes the IDENTICAL arithmetic as its codegen'd
 * Catalyst expression sibling (`org.apache.spark.sql.graft.*`), so a
 * SQL user gets the library's exact cross-engine contracts; the
 * expression forms remain the hot-path choice inside the operators
 * (whole-stage codegen vs this interface's per-row `produceResult`).
 */
private[graft] object GraftFunctions {

  def list(): Array[Identifier] =
    Array("jaccard_milli", "dot", "bucket")
      .map(n => Identifier.of(Array("system"), n))

  /** `bucket(numBuckets, keys...)` — the storage-bucket function behind
   *  storage-partitioned joins: pmod(xxhash64(keys...), numBuckets),
   *  the exact arithmetic of the bucketed-compaction layout
   *  (`GraftTable.compact(bucketBy)`) and the key index's hash family.
   *  Spark resolves a scan-reported bucket transform against the EMPTY
   *  namespace of the table's catalog
   *  (V2ExpressionUtils.loadV2FunctionOpt), binding with a synthetic
   *  leading int argument for numBuckets; both join sides must bind to
   *  the same `canonicalName` for the shuffle-free plan. */
  def bucket(): UnboundFunction = new UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "storage bucket: pmod(xxhash64(keys...), numBuckets)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length >= 2, "bucket(numBuckets, key...)")
      require(inputType.fields(0).dataType == IntegerType,
        s"numBuckets must be int, got ${inputType.fields(0).dataType}")
      val keyTypes: Array[DataType] = inputType.fields.drop(1).map(_.dataType)
      new ScalarFunction[java.lang.Integer] {
        override def name(): String = "bucket"
        override def canonicalName(): String =
          s"graft.bucket(${keyTypes.map(_.typeName).mkString(",")})"
        override def inputTypes(): Array[DataType] = IntegerType +: keyTypes
        override def resultType(): DataType = IntegerType
        override def isResultNullable: Boolean = false
        override def produceResult(input: InternalRow): java.lang.Integer = {
          val n = input.getInt(0)
          // the interpreted form of xxhash64(keys...): seed 42, null
          // children skipped — identical to the Catalyst expression the
          // bucketed rewrite evaluated, so a function-evaluated bucket
          // (e.g. Spark's shuffle-one-side SPJ path) matches storage
          var h = 42L
          var i = 1
          while (i < input.numFields) {
            if (!input.isNullAt(i))
              h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
                .hash(input.get(i, keyTypes(i - 1)), keyTypes(i - 1), h)
            i += 1
          }
          java.lang.Integer.valueOf(
            java.lang.Math.floorMod(h, n.toLong).toInt)
        }
      }
    }
  }

  def load(name: String): UnboundFunction = name match {
    case "bucket" => bucket()
    // declared non-deterministic although pure, for the same plan-
    // pinning reason as the Catalyst sibling (`JaccardMilli`): a
    // deterministic projection gets substituted into a pushed-down
    // filter, re-running the O(|A|+|B|) merge twice per pair
    case "jaccard_milli" => unbound("jaccard_milli",
      "exact Jaccard in milli-units over two sorted long arrays",
      Array(ArrayType(LongType), ArrayType(LongType)), LongType,
      deterministic = false,
      in => {
        if (in.isNullAt(0) || in.isNullAt(1)) null
        else {
          val x = in.getArray(0); val y = in.getArray(1)
          val nx = x.numElements(); val ny = y.numElements()
          var i = 0; var j = 0; var inter = 0L
          while (i < nx && j < ny) {
            val va = x.getLong(i); val vb = y.getLong(j)
            if (va == vb) { inter += 1L; i += 1; j += 1 }
            else if (va < vb) i += 1
            else j += 1
          }
          val uni = nx.toLong + ny.toLong - inter
          java.lang.Long.valueOf(
            if (uni == 0L) 0L else math.floor(1000.0 * inter / uni).toLong)
        }
      })
    case "dot" => unbound("dot",
      "IEEE in-order dot product of two equal-length double arrays",
      Array(ArrayType(DoubleType), ArrayType(DoubleType)), DoubleType,
      deterministic = true,
      in => {
        if (in.isNullAt(0) || in.isNullAt(1)) null
        else {
          val x = in.getArray(0); val y = in.getArray(1)
          val n = x.numElements()
          if (n != y.numElements()) null
          else {
            var s = 0.0; var i = 0; var isNull = false
            while (i < n && !isNull) {
              if (x.isNullAt(i) || y.isNullAt(i)) isNull = true
              else { s += x.getDouble(i) * y.getDouble(i); i += 1 }
            }
            if (isNull) null else java.lang.Double.valueOf(s)
          }
        }
      })
    case other =>
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(
        Identifier.of(Array("system"), other))
  }

  private def unbound(fname: String, desc: String,
      inTypes: Array[DataType], outType: DataType, deterministic: Boolean,
      eval: InternalRow => Any): UnboundFunction =
    new UnboundFunction {
      override def name(): String = fname
      override def description(): String = desc
      override def bind(inputType: StructType): BoundFunction = {
        require(inputType.length == inTypes.length,
          s"$fname takes ${inTypes.length} arguments")
        new ScalarFunction[Any] {
          override def name(): String = fname
          override def inputTypes(): Array[DataType] = inTypes
          override def resultType(): DataType = outType
          override def isResultNullable: Boolean = true
          override def isDeterministic: Boolean = deterministic
          override def produceResult(input: InternalRow): Any = eval(input)
        }
      }
    }
}

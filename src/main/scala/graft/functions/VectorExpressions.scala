package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{DotProduct, JaccardMilli, LshBucket}

/**
 * Native Catalyst expressions for the vector hot path — the brief's
 * preference order is (native `Expression` with `doGenCode`) > (Scala
 * UDF): the codegen'd loop reads `ArrayData` in place, so a 100-TB
 * scoring pass allocates NOTHING per row, where a UDF pays two
 * catalyst→Scala `Seq` conversions plus `toArray` copies per call.
 *
 * Arithmetic is the identical strictly-left-to-right IEEE fold the
 * UDF/HOF versions used, so every oracle comparison stays bit-exact.
 *
 * The expression class itself lives in `org.apache.spark.sql.graft`
 * (the standard Spark-extension shim package) because the pieces an
 * `Expression` implementation needs — `AbstractDataType` for
 * `ExpectsInputTypes`, `ExpressionUtils.column` for Column wrapping —
 * are `private[sql]`.
 */
object VectorExpressions {

  /** dot(a, b) over array<double> — codegen'd, allocation-free. */
  def dotProduct(a: Column, b: Column): Column = DotProduct.asColumn(a, b)

  /** LSH hyperplane bucket id (see `org.apache.spark.sql.graft
   *  .LshBucket`) — codegen'd; reads ArrayData in place against a
   *  per-executor memoized plane matrix; null array / null element →
   *  null. */
  def lshBucket(vec: Column, nbits: Int, table: Int): Column =
    LshBucket.asColumn(vec, nbits, table)

  /** Exact milli-Jaccard of two sorted distinct array<int> sets via a
   *  single allocation-free merge (see `org.apache.spark.sql.graft
   *  .JaccardMilli`; plan-pinned nondeterministic — the doc there
   *  explains why). */
  def jaccardMilliSorted(a: Column, b: Column): Column =
    JaccardMilli.asColumn(a, b)
}

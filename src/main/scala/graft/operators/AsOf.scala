package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for each left row, attach the most recent right row (same
 * key) with right.ts <= left.ts — the canonical time-series/CDC lookup
 * that Spark has no built-in operator for.
 *
 * Implementation is the union-and-carry-forward plan rather than a
 * per-key join: tag both sides, union them, and run one window pass
 * per key ordered by (ts, side) where `last(right_payload, ignoreNulls)`
 * carries the latest right row forward onto left rows. One shuffle on
 * the key, no range explosion, skew-bounded by the largest single key —
 * this is how the plan survives 100 TB (a naive range join is
 * quadratic per key).
 */
object AsOf {

  /**
   * @param left      probe side
   * @param right     reference side (its `payloadCols` are carried)
   * @param keyCols   equi-join keys
   * @param leftTs    event-time column on the left
   * @param rightTs   event-time column on the right
   * @param payloadCols right columns to attach (renamed as given)
   */
  def joinBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String,
      payloadCols: Map[String, String]): DataFrame = {
    val lCols = left.columns.toSeq
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1)) // left sorts after right at equal ts
      .withColumn("_pl", lit(null).cast("string"))
    // pack right payload into a struct so one last() carries everything
    val rStruct = struct(payloadCols.keys.toSeq.map(col): _*)
    val r = right
      .select(keyCols.map(col) :+ col(rightTs).as("_ts") :+
        rStruct.as("_rpay"): _*)
      .withColumn("_side", lit(0))
    val lNorm = l.select(
      (keyCols.map(col) :+ col("_ts") :+ col("_side") :+
        lit(null).cast(r.schema("_rpay").dataType).as("_rpay")) ++
        lCols.filterNot(keyCols.contains).map(col): _*)
    val rNorm = r.select(
      (keyCols.map(col) :+ col("_ts") :+ col("_side") :+ col("_rpay")) ++
        lCols.filterNot(keyCols.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lNorm.unionByName(rNorm)
      .withColumn("_carry", last(col("_rpay"), ignoreNulls = true).over(w))
    carried.where(col("_side") === 1)
      .select(lCols.map(col) ++ payloadCols.map { case (src, out) =>
        col(s"_carry.$src").as(out)
      }: _*)
  }
}

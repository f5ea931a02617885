package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dissect the declarative CDC fold's phases on the 1M-event probe. */
object ProbeFold {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val base = spark.read.schema(sch).parquet(s"$dir/events.parquet")
    val n = base.count()
    val big = (0 until 10).map { i =>
      base.select(lit("u").as("_op"), (col("event_id") + i * n).as("_lsn"),
        (col("user_id") + i * 1000000L).as("user_id"),
        (col("event_id") + i * n).as("event_id"),
        col("event_type"), col("value"))
    }.reduce(_ unionByName _).persist()
    big.count()
    (0 until 2).foreach { round =>
      val wOrd = Window.partitionBy("user_id").orderBy("_lsn")
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tagged0 = big
        .select(col("_op"), col("_lsn").cast("long").as("_lsn"),
          col("user_id"), col("event_id"), col("event_type"), col("value"))
        .repartition(32, col("user_id"))
      time(s"r$round shuffle only")(tagged0.count())
      val tagged = tagged0
        .withColumn("_nextOp", lead(col("_op"), 1).over(wOrd))
        .withColumn("_minApp",
          min(when(col("_op") =!= "d", col("_lsn"))).over(wRun))
        .withColumn("_surv", col("_op") =!= "d" &&
          (col("_nextOp").isNull || col("_nextOp") === "i"))
        .withColumn("_fall",
          (col("_op") === "d" && col("_minApp").isNull) ||
          (col("_op") === "u" && col("_minApp") === col("_lsn")))
      time(s"r$round fold no-persist")(tagged.count())
      val dataCols = Seq("user_id", "event_id", "event_type", "value")
      val keySet = Set("user_id")
      val outA = struct(lit("a").as("_tag") +: col("_lsn").as("_lsn") +:
        dataCols.map(c => col(c).as(c)): _*)
      val outD = struct(lit("d").as("_tag") +: col("_lsn").as("_lsn") +:
        dataCols.map(c =>
          (if (keySet(c)) col(c) else lit(null)).as(c)): _*)
      def maybe(cond: org.apache.spark.sql.Column, s: org.apache.spark.sql.Column) =
        when(cond, array(s)).otherwise(slice(array(s), 1, 0))
      val folded = tagged
        .select(explode(concat(
          maybe(col("_surv"), outA), maybe(col("_fall"), outD))).as("_r"))
        .select(col("_r._tag").as("_tag") +: col("_r._lsn").as("_lsn") +:
          dataCols.map(c => col(s"_r.$c").as(c)): _*)
      time(s"r$round fold+explode")(folded.count())
      val p = folded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"r$round fold+explode+persist")(p.where(col("_tag") =!= "a").count())
      time(s"r$round cached re-scan")(p.where(col("_tag") === "a").count())
      p.unpersist()
    }
    spark.stop()
  }
}

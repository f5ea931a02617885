package graft.tools

import graft.SparkEntry
import graft.sources.{OtelIngest, OtelSchema}
import graft.model.Identity
import graft.table.{GraftTable, TableConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the otel_metrics_agg phases: payload synth,
 *  OTLP-JSON parse/explode, table append, read+explode+agg. */
object ProfileOtel {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-otel-prof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val evSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props",
        org.apache.spark.sql.types.StringType)))
    val events = spark.read.schema(evSchema).parquet(s"$dir/events.parquet")
    events.count()
    val pay = events
      .groupBy(col("user_id"))
      .agg(collect_list(struct(col("ts"), col("value"))).as("pts"))
      .select(to_json(struct(array(struct(
        lit("https://opentelemetry.io/schemas/1.21.0").as("schemaUrl"),
        struct(array(struct(lit("service.name").as("key"),
          struct(lit("graft-events").as("stringValue")).as("value")))
          .as("attributes")).as("resource"),
        array(struct(
          struct(lit("graft.meter").as("name"),
            lit("1.0").as("version")).as("scope"),
          array(struct(
            lit("events.value").as("name"),
            lit("event value stream").as("description"),
            lit("1").as("unit"),
            struct(transform(col("pts"), p => struct(
              p("ts").cast("string").as("timeUnixNano"),
              p("value").as("asDouble"),
              array(struct(lit("user_id").as("key"),
                struct(col("user_id").cast("string").as("intValue"))
                  .as("value"))).as("attributes")))
              .as("dataPoints")).as("gauge"))).as("metrics")))
          .as("scopeMetrics"))).as("resourceMetrics"))).as("payload"))
    time("payload synth")(pay.count())
    val rows = OtelIngest.metricsToRows(pay, "payload")
    time("parse+explode")(rows.count())
    val root = java.nio.file.Files.createTempDirectory("otelprof").toString
    val table = GraftTable.create(spark, s"$root/t", OtelSchema.schema,
      Identity.None, TableConfig(walEnabled = false))
    time("ingestPayloads")(
      OtelIngest.ingestPayloads(table, pay, "payload", startLsn = 1))
    val agg = OtelSchema.explodeAttrs(table.read(None))
      .where(col("attr_key") === "user_id" && col("metric_type") === "gauge")
      .groupBy(col("attr_value").cast("long").as("user_id"))
      .agg(count(lit(1)).as("n"))
    time("read+explode+agg")(agg.count())
    spark.stop()
  }
}

package graft

import graft.model.Fixtures
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/**
 * Regeneration-proof testdata loading: the driver regenerates
 * /root/testdata between rounds and has already changed the physical
 * timestamp unit of events.parquet once (TIMESTAMP(NANOS) →
 * timestamp[us]), silently breaking every entry that baked a unit into
 * its arithmetic. Fixtures sniffs the parquet footer's logical-type
 * annotation and always hands back epoch MICROSECONDS — these tests
 * pin that contract for the units Spark can physically produce, plus
 * the fail-loudly path for un-annotated columns.
 */
class FixturesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val microsWanted = Seq(
    1704067200000000L, 1704067207179575L, 1704070000123456L)

  private def writeEvents(dir: String, outputType: String): Unit = {
    val old = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", outputType)
    try {
      import spark.implicits._
      microsWanted.zipWithIndex
        .map { case (us, i) => (i.toLong, us, i.toLong, "t", 1.0, "{}") }
        .toDF("event_id", "us", "user_id", "event_type", "value", "props")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    } finally old match {
      case Some(v) =>
        spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None =>
        spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
  }

  test("timestamp[us] fixtures read back as their exact micros") {
    val dir = Files.createTempDirectory("fix-us").toString
    writeEvents(dir, "TIMESTAMP_MICROS")
    val got = Fixtures.eventsMicros(spark, dir)
      .orderBy("event_id").select("ts").collect().map(_.getLong(0)).toSeq
    assert(got == microsWanted)
  }

  test("timestamp[ms] fixtures normalize to micros (x1000)") {
    val dir = Files.createTempDirectory("fix-ms").toString
    writeEvents(dir, "TIMESTAMP_MILLIS")
    val got = Fixtures.eventsMicros(spark, dir)
      .orderBy("event_id").select("ts").collect().map(_.getLong(0)).toSeq
    // the millis write truncated sub-ms precision; normalization must
    // scale the STORED value, never guess the original
    assert(got == microsWanted.map(us => us / 1000L * 1000L))
  }

  test("a non-TIMESTAMP ts column fails loudly instead of guessing") {
    val dir = Files.createTempDirectory("fix-raw").toString
    import spark.implicits._
    microsWanted.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong, "t", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[RuntimeException] {
      Fixtures.eventsMicros(spark, dir).collect()
    }
    assert(e.getMessage.contains("TIMESTAMP"))
  }
}

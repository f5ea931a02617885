package graft

import graft.model._
import graft.table._
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/**
 * Structured Streaming sink over append-only graft tables: micro-batch
 * epochs commit exactly-once through the manifest's epoch watermark
 * (`Manifest.streamEpochs`), making the DSv2 connector a full
 * source+sink loop.
 */
class StreamSinkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val schema = SchemaDsl.struct("id" -> "int64", "v" -> "int64")

  private def freshRoot(): String =
    Files.createTempDirectory("graft-sink").toString + "/t"

  test("writeStream.format(graft) appends micro-batches exactly-once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = freshRoot()
    GraftTable.create(spark, root, schema, Identity.None,
      TableConfig(walEnabled = false))
    val in = MemoryStream[(Long, Long)]
    val q = in.toDF().toDF("id", "v")
      .writeStream.format("graft")
      .option("path", root)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sink-ckpt").toString)
      .start()
    try {
      in.addData((1L, 10L), (2L, 20L))
      q.processAllAvailable()
      in.addData((3L, 30L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.format("graft").option("path", root).load()
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    val m = graft.format.ManifestLog.loadLatest(root).get
    assert(m.streamEpochs == 2L, "two epochs committed")
  }

  test("epoch replay after restart is a no-op (watermark in manifest)") {
    import spark.implicits._
    val root = freshRoot()
    val t = GraftTable.create(spark, root, schema, Identity.None,
      TableConfig(walEnabled = false))
    def ev(rows: (Long, Long)*) = rows.toSeq.toDF("id", "v")
      .select(lit("i").as("_op"), col("id"), col("v"))
    assert(t.applyEpochDF(ev((1L, 10L)), epochId = 0))
    assert(t.applyEpochDF(ev((2L, 20L)), epochId = 1))
    // restart: a fresh handle re-offers epoch 1 (Spark replays the
    // last uncommitted-to-its-log epoch) — the manifest watermark
    // rejects it, no duplicate rows
    val t2 = GraftTable.open(spark, root, Identity.None,
      TableConfig(walEnabled = false))
    assert(!t2.applyEpochDF(ev((2L, 20L)), epochId = 1))
    assert(t2.applyEpochDF(ev((3L, 30L)), epochId = 2))
    assert(t2.read(None).count() == 3L)
    assert(graft.format.ManifestLog.loadLatest(root).get.streamEpochs == 3L)
  }

  test("keyed tables take CDC event streams: upserts + deletes fold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = freshRoot()
    GraftTable.create(spark, root, schema, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    val in = MemoryStream[(String, Long, Long, Long)]
    val q = in.toDF().toDF("_op", "_lsn", "id", "v")
      .writeStream.format("graft")
      .option("path", root).option("cdc", "true")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sink-ckpt").toString)
      .start()
    try {
      // epoch 0: three inserts
      in.addData(("u", 1L, 1L, 10L), ("u", 2L, 2L, 20L), ("u", 3L, 3L, 30L))
      q.processAllAvailable()
      // epoch 1: re-upsert key 1, delete key 2 — the fold must DV the
      // committed old versions via the key index
      in.addData(("u", 10L, 1L, 11L), ("d", 11L, 2L, 0L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.format("graft").option("path", root).load()
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 11L), (3L, 30L)))
    val m = graft.format.ManifestLog.loadLatest(root).get
    assert(m.streamEpochs == 2L)
    assert(m.commitLsn == 11L, "commit rides the source LSN axis")
  }

  test("a keyed plain-row stream refuses; the $cdc facade is the sink") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = freshRoot()
    GraftTable.create(spark, root, schema, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    val in = MemoryStream[(Long, Long)]
    val e = intercept[Exception] {
      val q = in.toDF().toDF("id", "v")
        .writeStream.format("graft")
        .option("path", root)
        .option("checkpointLocation",
          Files.createTempDirectory("graft-sink-ckpt").toString)
        .start()
      try { in.addData((1L, 1L)); q.processAllAvailable() }
      finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.toLowerCase.contains("keyed") ||
      m.toLowerCase.contains("does not support")))
    // the cdc facade refuses a frame missing the event columns
    val e2 = intercept[Exception] {
      val q = in.toDF().toDF("id", "v")
        .writeStream.format("graft")
        .option("path", root).option("cdc", "true")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-sink-ckpt").toString)
        .start()
      try { in.addData((2L, 2L)); q.processAllAvailable() }
      finally q.stop()
    }
    assert(msgs(e2).exists(m => m.contains("_op") ||
      m.toLowerCase.contains("column")))
  }
}

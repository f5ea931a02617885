package graft

import graft.model._
import graft.streaming.CdcPipeline
import graft.table._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/**
 * The Structured-Streaming CDC surface: in-stream schema evolution
 * (the reference's mid-stream AlterTable from a changed `Relation`
 * message, `pg_replicate/moonlink_sink.rs:347-361`) and the bounded
 * driver funnel for giant transaction-bearing micro-batches.
 */
class CdcPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-cdc-pipeline-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmpDir(): String =
    Files.createTempDirectory("graft-cdc-pipe").toString

  private val schema = SchemaDsl.struct(
    "id" -> "int64", "name" -> "string", "v" -> "int64")

  private def mkTable(cfg: TableConfig): GraftTable =
    GraftTable.create(spark, tmpDir() + "/t", schema,
      Identity.Keys(Seq("id")), cfg)

  /** event frame with the full union of columns the tests use */
  private def frame(rows: Seq[(String, Long, Option[Long], String, Row)]): DataFrame = {
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(
      StructField("_op", StringType), StructField("_lsn", LongType),
      StructField("_xact", LongType), StructField("_ddl", StringType),
      StructField("id", LongType), StructField("name", StringType),
      StructField("v", LongType), StructField("grade", StringType)))
    val data = rows.map { case (op, lsn, xact, ddl, d) =>
      Row(op, lsn, xact.orNull, ddl,
        d.get(0), d.get(1), d.get(2), d.get(3))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), sch)
  }

  private def d(id: java.lang.Long, name: String, v: java.lang.Long,
      grade: String = null): Row = Row(id, name, v, grade)

  test("in-stream alter_add and alter_drop split one micro-batch") {
    val t = mkTable(TableConfig(memSliceSize = 4, walEnabled = false))
    // ingest -> add 'grade' -> ingest with grade -> drop 'name' -> ingest
    val batch = frame(Seq(
      ("i", 1L, None, null, d(1L, "a", 10L)),
      ("i", 2L, None, null, d(2L, "b", 20L)),
      ("alter_add", 3L, None, "grade string", d(null, null, null)),
      ("i", 4L, None, null, d(3L, "c", 30L, "A")),
      ("alter_drop", 5L, None, "name", d(null, null, null)),
      ("i", 6L, None, null, d(4L, null, 40L, "B"))))
    CdcPipeline.applyBatch(t, batch)
    assert(t.schema.fieldNames.toSeq == Seq("id", "v", "grade"))
    val got = t.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq
    assert(got == Seq((1L, 10L, null), (2L, 20L, null),
      (3L, 30L, "A"), (4L, 40L, "B")),
      "pre-alter rows read null grade; post-alter rows keep values; name gone")
    t.drop()
  }

  test("in-stream alters survive a crash-reopen (WAL replay idempotence)") {
    val t = mkTable(TableConfig(memSliceSize = 100, walEnabled = true))
    CdcPipeline.applyBatch(t, frame(Seq(
      ("i", 1L, None, null, d(1L, "a", 10L)),
      ("alter_add", 2L, None, "grade string", d(null, null, null)),
      ("i", 3L, None, null, d(2L, "b", 20L, "B")))))
    // reopen from disk: the WAL window replays the alter (already
    // reflected in the published manifest schema — must be a no-op)
    // plus the appends around it
    val r = GraftTable.open(spark, t.root, Identity.Keys(Seq("id")),
      TableConfig(memSliceSize = 100, walEnabled = true))
    assert(r.schema.fieldNames.toSeq == Seq("id", "name", "v", "grade"))
    val got = r.read().orderBy("id").collect()
      .map(x => (x.getLong(0), x.getString(1),
        if (x.isNullAt(3)) null else x.getString(3))).toSeq
    assert(got == Seq((1L, "a", null), (2L, "b", "B")))
    t.drop()
  }

  test("giant xact batch streams through applyStreamed, memory bounded") {
    // driverEventBatchRows tiny -> the streamed path MUST run; the
    // mem-slice cap forces staged flushes mid-transaction, so the
    // buffer drains while the iterator is still being consumed
    val t = mkTable(TableConfig(memSliceSize = 500, walEnabled = false,
      driverEventBatchRows = 1000))
    val n = 20000L
    val rows = spark.range(1, n + 1).select(
      lit("i").as("_op"), col("id").as("_lsn"), lit(7L).as("_xact"),
      lit(null).cast("string").as("_ddl"), col("id"),
      concat(lit("u"), col("id")).as("name"), (col("id") * 2).as("v"),
      lit(null).cast("string").as("grade"))
    val commit = frame(Seq(("c", n + 1L, Some(7L), null, d(null, null, null))))
    CdcPipeline.applyBatch(t, rows.unionByName(commit))
    assert(t.streamedApplies == 1L,
      "past driverEventBatchRows the batch must take the streamed path")
    assert(t.read().count() == n)
    val chk = t.read().where(col("id") === 12345L).head()
    assert(chk.getString(1) == "u12345" && chk.getLong(2) == 24690L)
    t.drop()
  }

  test("small xact batches still take the collected driver path") {
    val t = mkTable(TableConfig(memSliceSize = 500, walEnabled = false,
      driverEventBatchRows = 1000))
    CdcPipeline.applyBatch(t, frame(Seq(
      ("i", 1L, Some(9L), null, d(1L, "a", 10L)),
      ("c", 2L, Some(9L), null, d(null, null, null)))))
    assert(t.streamedApplies == 0L, "small batches stay on the simple path")
    assert(t.read().count() == 1L)
    t.drop()
  }

  test("streaming corpus filter: state dedups across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    val good = "the quick brown fox jumps over the lazy dog and then " * 20
    val docs = in.toDF().toDF("doc_id", "lang", "text")
    val out = graft.streaming.CorpusStream
      .dedupFilterStream(docs, "text", minQuality = 150)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("scf_test").start()
    // batch 1: two distinct docs (one is an in-batch dup pair -> min id)
    in.addData((1L, "en", good), (2L, "en", good + "tail "),
      (3L, "en", good))
    q.processAllAvailable()
    // batch 2: exact re-sends of both texts plus one junk doc
    in.addData((10L, "en", good), (11L, "en", good + "tail "),
      (12L, "en", "!!"))
    q.processAllAvailable()
    val got = spark.table("scf_test").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    q.stop()
    assert(got == Seq(1L, 2L),
      "in-batch dup elects min id; cross-batch re-sends and junk dropped")
  }

  test("streaming minhash links candidates to the bucket representative") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val a = ("the quick brown fox jumps over the lazy dog " * 10) +
      "and then it sat down to rest for a while near the river bank"
    val b = a + " one extra trailing clause changes a few shingles only"
    val other = "completely different content about spark structured " +
      "streaming state stores and deterministic oracle verification " * 8
    val docs = in.toDF().toDF("doc_id", "text")
    val q = graft.streaming.CorpusStream
      .minhashCandidateStream(docs, "doc_id", "text",
        shingleN = 2, numHashes = 64, bands = 16)
      .writeStream.outputMode("append").format("memory")
      .queryName("smh_test").start()
    in.addData((1L, a), (2L, other))
    q.processAllAvailable()
    in.addData((3L, b), (4L, a)) // near-dup of 1 and exact dup of 1
    q.processAllAvailable()
    val pairs = spark.table("smh_test").select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(pairs.contains((1L, 4L)), "exact copy links to representative")
    assert(pairs.contains((1L, 3L)), "near-dup collides in some band")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L),
      "unrelated doc never links")
  }

  test("stream-stream interval join matches across micro-batches, honors the window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicksIn = MemoryStream[(Long, Long, Long)]    // user, click_id, us
    val buysIn = MemoryStream[(Long, Long, Long)]      // user, purchase_id, us
    val hour = 3600L * 1000000L
    // event times must sit above the INITIAL watermark (epoch 0) or
    // the first batch's rows are dropped as late
    val t0 = 1704067200L * 1000000L // 2024-01-01
    val clicks = clicksIn.toDF().toDF("user_id", "click_id", "c_us")
      .withColumn("c_ts", timestamp_micros(col("c_us"))).drop("c_us")
    val buys = buysIn.toDF().toDF("user_id", "purchase_id", "p_us")
      .withColumn("p_ts", timestamp_micros(col("p_us"))).drop("p_us")
    val q = graft.streaming.StreamJoin.intervalJoin(
        clicks, buys, "user_id", "c_ts", "p_ts",
        maxSpan = "4 hours", delay = "1 hour")
      .select("click_id", "purchase_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("sj_test").start()
    // batch 1: click u1@t0, purchase u1@t0+1h (in-batch match),
    //          purchase u2@t0 (no click), click u3@t0
    clicksIn.addData((1L, 100L, t0), (3L, 300L, t0))
    buysIn.addData((1L, 900L, t0 + hour), (2L, 901L, t0))
    q.processAllAvailable()
    // batch 2: purchase u3@t0+3h matches the batch-1 click (state),
    //          purchase u1@t0+5h is PAST the 4h window
    buysIn.addData((3L, 902L, t0 + 3 * hour), (1L, 903L, t0 + 5 * hour))
    q.processAllAvailable()
    val got = spark.table("sj_test")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(got == Set((100L, 900L), (300L, 902L)),
      "in-batch + cross-batch matches only, window and direction enforced")
  }
}

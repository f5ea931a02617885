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

  test("the $cdc facade resolves through the catalog (toTable)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wh = Files.createTempDirectory("graft-cdc-cat").toString
    val cname = "gs" + math.abs(wh.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cname",
      classOf[graft.sources.GraftCatalogPlugin].getName)
    spark.conf.set(s"spark.sql.catalog.$cname.warehouse", wh)
    GraftCatalog(spark, wh).createTable("kv", schema,
      Identity.Keys(Seq("id")), TableConfig(walEnabled = false))
    val in = MemoryStream[(String, Long, Long, Long)]
    val q = in.toDF().toDF("_op", "_lsn", "id", "v")
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sink-ckpt").toString)
      .toTable(s"$cname.graft.`kv$$cdc`")
    try {
      in.addData(("u", 1L, 1L, 10L), ("d", 2L, 1L, 0L), ("u", 3L, 2L, 20L))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.sql(s"SELECT id, v FROM $cname.graft.kv").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((2L, 20L)))
  }

  test("chaos: CDC sink epochs are atomic and exactly-once under faults") {
    import spark.implicits._
    val root = freshRoot()
    val t = GraftTable.create(spark, root, schema, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    def ev(lsn0: Long, rows: (String, Long, Long)*) =
      rows.toSeq.zipWithIndex.map { case ((op, id, v), i) =>
        (op, lsn0 + i, id, v) }.toDF("_op", "_lsn", "id", "v")
    assert(t.applyEpochCdcDF(ev(1L, ("u", 1L, 10L), ("u", 2L, 20L)), 0))
    val rnd = new scala.util.Random(5L)
    val faults = new graft.format.FioFaults {
      @volatile var armed = false
      override def beforeOp(op: String, path: String): Unit =
        if (armed && rnd.nextDouble() < 0.2)
          throw new java.io.IOException(s"injected fault: $op $path")
    }
    graft.format.Fio.installFaults(root, faults)
    try {
      // epoch 1 attempts under faults: each try is all-or-nothing; the
      // epoch watermark makes a retry after a POST-commit fault no-op
      var done = false
      var tries = 0
      while (!done && tries < 10) {
        tries += 1
        faults.armed = true
        val t2 = try {
          faults.armed = false // open/recovery runs clean
          val h = GraftTable.open(spark, root, Identity.Keys(Seq("id")),
            TableConfig(walEnabled = false))
          faults.armed = true
          h
        } catch { case _: Throwable => null }
        if (t2 != null) {
          try { t2.applyEpochCdcDF(ev(10L, ("u", 1L, 11L), ("d", 2L, 0L)), 1) }
          catch { case _: Throwable => }
          faults.armed = false
          done = graft.format.ManifestLog.loadLatest(root).get.streamEpochs == 2L
        }
        faults.armed = false
      }
      assert(done, s"epoch 1 never landed in $tries tries")
    } finally graft.format.Fio.clearFaults()
    // final state: epoch 1 applied EXACTLY once whatever the retries
    val h = GraftTable.open(spark, root, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    assert(h.read(None).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 11L)))
    // a replay of epoch 1 against the recovered table is refused
    assert(!h.applyEpochCdcDF(ev(10L, ("u", 1L, 999L)), 1))
  }

  test("a failed epoch retried on the SAME handle applies exactly once") {
    import spark.implicits._
    val root = freshRoot()
    val t = GraftTable.create(spark, root, schema, Identity.None,
      TableConfig(walEnabled = false))
    def ev(rows: (Long, Long)*) = rows.toSeq.toDF("id", "v")
      .select(lit("i").as("_op"), col("id"), col("v"))
    assert(t.applyEpochDF(ev((1L, 10L)), 0))
    // epoch 1 fails mid-apply (every mutating IO op throws)
    val faults = new graft.format.FioFaults {
      @volatile var armed = true
      override def beforeOp(op: String, path: String): Unit =
        if (armed) throw new java.io.IOException(s"injected fault: $op")
    }
    graft.format.Fio.installFaults(root, faults)
    try intercept[Exception] { t.applyEpochDF(ev((2L, 20L)), 1) }
    finally { faults.armed = false; graft.format.Fio.clearFaults() }
    // the in-memory watermark resynced from the durable manifest, so
    // the SAME handle's retry must apply (not silently skip) — and
    // exactly once
    assert(t.applyEpochDF(ev((2L, 20L)), 1))
    assert(!t.applyEpochDF(ev((2L, 20L)), 1))
    assert(t.read(None).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L), (2L, 20L)))
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

  test("second query / fresh-checkpoint epochs are NOT skipped (per-query gate)") {
    import spark.implicits._
    val root = freshRoot()
    val t = GraftTable.create(spark, root, schema, Identity.None,
      TableConfig(walEnabled = false))
    def ev(rows: (Long, Long)*) = rows.toSeq.toDF("id", "v")
      .select(lit("i").as("_op"), col("id"), col("v"))
    // query A commits two epochs
    assert(t.applyEpochDF(ev((1L, 10L)), 0, queryId = "qA"))
    assert(t.applyEpochDF(ev((2L, 20L)), 1, queryId = "qA"))
    // a SECOND query (or the same stream restarted on a fresh
    // checkpoint) restarts its epoch ids at 0 — under a single global
    // counter these early epochs would be silently dropped as replays
    assert(t.applyEpochDF(ev((3L, 30L)), 0, queryId = "qB"))
    assert(t.read(None).count() == 3L)
    // each query's OWN replays are still refused
    assert(!t.applyEpochDF(ev((2L, 20L)), 1, queryId = "qA"))
    assert(!t.applyEpochDF(ev((3L, 30L)), 0, queryId = "qB"))
    // the per-query map is durable: a reopened handle keeps both gates
    val t2 = GraftTable.open(spark, root, Identity.None,
      TableConfig(walEnabled = false))
    assert(!t2.applyEpochDF(ev((3L, 30L)), 0, queryId = "qB"))
    assert(t2.applyEpochDF(ev((4L, 40L)), 1, queryId = "qB"))
    assert(t2.applyEpochDF(ev((5L, 50L)), 2, queryId = "qA"))
    assert(t2.read(None).count() == 5L)
  }

  test("CDC epoch drops already-committed LSNs (at-least-once source replay)") {
    import spark.implicits._
    val root = freshRoot()
    val t = GraftTable.create(spark, root, schema, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    def ev(rows: (String, Long, Long, Long)*) =
      rows.toSeq.toDF("_op", "_lsn", "id", "v")
    assert(t.applyEpochCdcDF(
      ev(("u", 1L, 1L, 10L), ("u", 2L, 2L, 20L)), 0, queryId = "qA"))
    val v1 = graft.format.ManifestLog.loadLatest(root).get.version
    // a fresh query re-reads from its confirmed source position: LSNs
    // 1-2 arrive AGAIN in its epoch 0 beside genuinely new LSN 3. The
    // replayed LSNs must no-op (no redundant row versions), only LSN 3
    // applies.
    assert(t.applyEpochCdcDF(
      ev(("u", 1L, 1L, 999L), ("u", 2L, 2L, 999L), ("u", 3L, 3L, 30L)),
      0, queryId = "qB"))
    val got = t.read(None).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 10L), (2L, 20L), (3L, 30L)),
      s"replayed LSNs must not re-apply: $got")
    assert(t.commitLsn == 3L)
    // an epoch that is ONLY replayed LSNs still advances the watermark
    assert(t.applyEpochCdcDF(ev(("u", 3L, 3L, 777L)), 1, queryId = "qB"))
    assert(t.read(None).where("id = 3").head().getLong(1) == 30L)
    assert(graft.format.ManifestLog.loadLatest(root).get.version > v1)
  }
}

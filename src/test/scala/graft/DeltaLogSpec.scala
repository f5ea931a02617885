package graft

import graft.format.delta.DeltaLog
import graft.model._
import graft.table._
import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/**
 * Delta transaction-log export (S9): spec-layout commits under
 * `_delta_log/`, add/remove diffs across versions, DV-materialization
 * precondition, put-if-absent version claiming, and reconstruction
 * through the independent replay parser.
 */
class DeltaLogSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val schema = SchemaDsl.struct("id" -> "int64", "v" -> "int64")

  test("export commits the spec layout and replays to the same state") {
    val root = Files.createTempDirectory("graft-delta").toString + "/t"
    val t = GraftTable.create(spark, root, schema, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    t.upsertAll((1L to 50L).map(i => Row(i, i * 2L)), startLsn = 1)
    t.flush(); t.publish()
    val v0 = DeltaLog.sync(root, t.currentManifest, nowMs = 1700000000000L)
    assert(v0 == 0L)
    // version 0 pins protocol + metaData + adds (golden layout keys)
    val body = graft.format.Fio.readString(
      s"$root/_delta_log/00000000000000000000.json")
    Seq("\"protocol\"", "\"minReaderVersion\":1", "\"metaData\"",
      "\"schemaString\"", "\"add\"", "\"partitionValues\"",
      "\"dataChange\":true", "numRecords").foreach(k =>
      assert(body.contains(k), s"missing $k"))
    val df = DeltaLog.readDataFrame(spark, root)
    assert(df.count() == 50L)
    assert(df.where("id = 10").head().getLong(1) == 20L)
    // a no-change sync commits nothing
    assert(DeltaLog.sync(root, t.currentManifest) == -1L)

    // deletes must MATERIALIZE before export (reader-v1 has no DVs)
    t.apply(Seq(Delete(Seq(5L), 100L), Commit(101L)))
    t.flush(); t.publish()
    intercept[IllegalArgumentException] {
      DeltaLog.sync(root, t.currentManifest)
    }
    t.optimize() // forced compaction drops DV'd rows into fresh files
    val v1 = DeltaLog.sync(root, t.currentManifest, nowMs = 1700000001000L)
    assert(v1 == 1L)
    val body1 = graft.format.Fio.readString(
      s"$root/_delta_log/00000000000000000001.json")
    assert(body1.contains("\"remove\"") && body1.contains("\"add\""),
      "compaction swap = adds + removes in one commit")
    val df1 = DeltaLog.readDataFrame(spark, root)
    assert(df1.count() == 49L && df1.where("id = 5").count() == 0L)
    // the replayed state never references a removed file
    val st = DeltaLog.readState(root)
    assert(st.version == 1L)
    st.files.foreach(f =>
      assert(graft.format.Fio.exists(s"$root/${f.path}"), f.path))
    assert(st.files.map(_.numRecords).sum == 49L)
  }

  test("add actions carry typed file-skipping stats; checkpoints keep them") {
    // the Delta protocol's per-file stats (numRecords + minValues /
    // maxValues / nullCount — the reference's `deltalake/stats.rs`):
    // typed JSON per column, derived from the manifest stat strings
    val sch = SchemaDsl.struct("id" -> "int64", "name" -> "string",
      "amt" -> "decimal(12,2)")
    val root = Files.createTempDirectory("graft-delta-stats").toString + "/t"
    val t = GraftTable.create(spark, root, sch, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    def bd(c: Long) = new java.math.BigDecimal(
      java.math.BigInteger.valueOf(c), 2)
    t.apply((1L to 9L).flatMap(i => CdcEvent.upsert(
      Row(i, if (i == 4) null else s"n$i", bd(i * 125L)), Seq(i), i))
      :+ Commit(10L))
    t.flush(); t.publish()
    assert(DeltaLog.sync(root, t.currentManifest, nowMs = 1700000000000L) == 0L)
    val body = graft.format.Fio.readString(
      s"$root/_delta_log/00000000000000000000.json")
    val addLine = body.split('\n').find(_.contains("\"add\"")).get
    val stats = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(addLine).get("add").get("stats").asText)
    assert(stats.get("numRecords").asLong == 9L)
    assert(stats.get("minValues").get("id").asLong == 1L &&
      stats.get("maxValues").get("id").asLong == 9L)
    assert(stats.get("minValues").get("name").asText == "n1" &&
      stats.get("maxValues").get("name").asText == "n9")
    // decimals are JSON numbers with the column scale
    assert(stats.get("minValues").get("amt").decimalValue()
      .compareTo(new java.math.BigDecimal("1.25")) == 0)
    assert(stats.get("nullCount").get("name").asLong == 1L &&
      stats.get("nullCount").get("id").asLong == 0L)
    // a checkpoint carries the RAW stats through (never degrades the
    // skipping metadata to numRecords-only)
    DeltaLog.checkpoint(spark, root)
    DeltaLog.expireLog(root)
    val st = DeltaLog.readStateFromCheckpoint(spark, root)
    val fstats = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(st.files.head.stats)
    assert(fstats.get("maxValues").get("name").asText == "n9",
      "checkpointed add must keep full stats")
    assert(DeltaLog.readDataFrame(spark, root).count() == 9L)
  }

  test("version claiming is put-if-absent (optimistic concurrency)") {
    val root = Files.createTempDirectory("graft-delta2").toString + "/t"
    val t = GraftTable.create(spark, root, schema, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    t.upsertAll(Seq(Row(1L, 1L)), startLsn = 1); t.flush(); t.publish()
    assert(DeltaLog.sync(root, t.currentManifest) == 0L)
    // a stale writer re-claiming version 0 cannot clobber the winner's
    // commit (the rename never lands on an existing target)...
    val before = graft.format.Fio.readString(
      s"$root/_delta_log/00000000000000000000.json")
    graft.format.Fio.writeAtomic(
      s"$root/_delta_log/00000000000000000000.json", "{}")
    assert(graft.format.Fio.readString(
      s"$root/_delta_log/00000000000000000000.json") == before)
    // ...and the sync-level loser detects the conflict loudly: a rival
    // lands version 1 in the window between sync's state replay and its
    // commit write (injected at the exact protocol point via FioFaults)
    t.upsertAll(Seq(Row(2L, 2L)), startLsn = 10); t.flush(); t.publish()
    val rivalPath = java.nio.file.Paths.get(
      s"$root/_delta_log/00000000000000000001.json")
    graft.format.Fio.installFaults(root, new graft.format.FioFaults {
      override def beforeOp(op: String, path: String): Unit =
        if (op == "write" && path.endsWith("00000000000000000001.json") &&
            !java.nio.file.Files.exists(rivalPath))
          java.nio.file.Files.write(rivalPath,
            """{"commitInfo":{"timestamp":1,"operation":"WRITE"}}
              |""".stripMargin.getBytes("UTF-8"))
    })
    try intercept[java.util.ConcurrentModificationException] {
      DeltaLog.sync(root, t.currentManifest)
    } finally graft.format.Fio.clearFaults()
  }

  test("schema evolution re-emits metaData; replay resolves the new shape") {
    val root = Files.createTempDirectory("graft-delta3").toString + "/t"
    val t = GraftTable.create(spark, root, schema, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    t.upsertAll(Seq(Row(1L, 10L)), startLsn = 1); t.flush(); t.publish()
    assert(DeltaLog.sync(root, t.currentManifest) == 0L)
    t.alterAddColumn("w", "int64")
    t.flush(); t.publish()
    assert(DeltaLog.sync(root, t.currentManifest) == 1L)
    val body1 = graft.format.Fio.readString(
      s"$root/_delta_log/00000000000000000001.json")
    assert(body1.contains("\"metaData\""), "schema change re-emits metaData")
    val df = DeltaLog.readDataFrame(spark, root)
    assert(df.schema.fieldNames.toSeq == Seq("id", "v", "w"))
    assert(df.count() == 1L && df.head().isNullAt(2))
  }

  test("checkpoint bounds log replay; state survives JSON-tail deletion") {
    val root = Files.createTempDirectory("graft-delta4").toString + "/t"
    val t = GraftTable.create(spark, root, schema, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    (1 to 3).foreach { i =>
      t.upsertAll(Seq(Row(i.toLong, i * 10L)), startLsn = i * 10L)
      t.flush(); t.publish()
      DeltaLog.sync(root, t.currentManifest, nowMs = 1700000000000L + i)
    }
    val v = DeltaLog.checkpoint(spark, root)
    assert(v == 2L)
    assert(graft.format.Fio.exists(
      s"$root/_delta_log/00000000000000000002.checkpoint.parquet"))
    assert(graft.format.Fio.exists(s"$root/_delta_log/_last_checkpoint"))
    // checkpoint-based replay equals the JSON replay
    val viaJson = DeltaLog.readState(root)
    val viaCkpt = DeltaLog.readStateFromCheckpoint(spark, root)
    assert(viaCkpt.files.map(_.path).sorted == viaJson.files.map(_.path).sorted)
    assert(viaCkpt.schemaString == viaJson.schemaString)
    // a commit AFTER the checkpoint lands in the tail replay
    t.upsertAll(Seq(Row(9L, 90L)), startLsn = 100L); t.flush(); t.publish()
    DeltaLog.sync(root, t.currentManifest, nowMs = 1700000001000L)
    val after = DeltaLog.readStateFromCheckpoint(spark, root)
    assert(after.version == 3L)
    assert(after.files.map(_.numRecords).sum == 4L)
    // the checkpoint alone suffices: expire the pre-checkpoint JSONs
    // (spec: readers may start at the checkpoint) and replay still works
    assert(DeltaLog.expireLog(root) == 3)
    (0L to 2L).foreach(i => assert(
      !graft.format.Fio.exists(f"$root/_delta_log/$i%020d.json")))
    val pruned = DeltaLog.readStateFromCheckpoint(spark, root)
    assert(pruned.files.map(_.numRecords).sum == 4L)
    // the WRITER path survives expiry too: the next sync replays
    // checkpoint-first, claims the right next version, and the exported
    // table still reads whole
    t.upsertAll(Seq(Row(10L, 100L)), startLsn = 200L); t.flush(); t.publish()
    val v4 = DeltaLog.sync(root, t.currentManifest,
      nowMs = 1700000002000L, spark = Some(spark))
    assert(v4 == 4L)
    val df = DeltaLog.readDataFrame(spark, root)
    assert(df.count() == 5L)
    assert(DeltaLog.readStateFromCheckpoint(spark, root).version == 4L)
  }

  test("second checkpoint after expiry keeps pre-checkpoint adds " +
      "(even with a schema-change metaData in the tail)") {
    val root = Files.createTempDirectory("graft-delta5").toString + "/t"
    val t = GraftTable.create(spark, root, schema, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    (1 to 3).foreach { i =>
      t.upsertAll(Seq(Row(i.toLong, i * 10L)), startLsn = i * 10L)
      t.flush(); t.publish()
      DeltaLog.sync(root, t.currentManifest, nowMs = 1700000000000L + i)
    }
    // checkpoint #1 + expiry: pre-checkpoint state now lives ONLY in
    // the checkpoint parquet
    assert(DeltaLog.checkpoint(spark, root) == 2L)
    assert(DeltaLog.expireLog(root) == 3)
    // a schema change lands a metaData action in the post-checkpoint
    // JSON tail — the exact shape that let a JSON-only replay "succeed"
    // with an incomplete file set before the fix
    t.alterAddColumn("w", "int64")
    t.upsertAll(Seq(Row(9L, 90L, 9L)), startLsn = 100L)
    t.flush(); t.publish()
    assert(DeltaLog.sync(root, t.currentManifest, nowMs = 1700000001000L,
      spark = Some(spark)) == 3L)
    // checkpoint #2 must fold checkpoint#1 + tail, not the tail alone;
    // a lossy one here + expiry would be PERMANENT data loss
    assert(DeltaLog.checkpoint(spark, root) == 3L)
    assert(DeltaLog.expireLog(root) == 1)
    val st = DeltaLog.readStateFromCheckpoint(spark, root)
    assert(st.files.map(_.numRecords).sum == 4L,
      s"pre-checkpoint adds lost: ${st.files}")
    assert(st.schemaString.contains("\"w\""), "tail metaData must win")
    assert(DeltaLog.readDataFrame(spark, root).count() == 4L)
    // idempotent re-checkpoint at an unchanged version is a no-op
    assert(DeltaLog.checkpoint(spark, root) == 3L)
  }

  test("sync on a checkpointed table refuses a Spark-less JSON-only replay") {
    val root = Files.createTempDirectory("graft-delta6").toString + "/t"
    val t = GraftTable.create(spark, root, schema, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    t.upsertAll(Seq(Row(1L, 1L)), startLsn = 1); t.flush(); t.publish()
    DeltaLog.sync(root, t.currentManifest)
    assert(DeltaLog.checkpoint(spark, root) == 0L)
    // with the full JSON chain still on disk, Spark-less sync stays
    // sound (complete replay) — only TRUNCATION makes it unsafe
    assert(DeltaLog.sync(root, t.currentManifest) == -1L)
    assert(DeltaLog.expireLog(root) == 1)
    t.upsertAll(Seq(Row(2L, 2L)), startLsn = 10); t.flush(); t.publish()
    // spark=None + checkpoint + expired prefix → loud error, never a
    // silent tail-only replay that ghosts removed files
    val e = intercept[IllegalStateException] {
      DeltaLog.sync(root, t.currentManifest)
    }
    assert(e.getMessage.contains("_last_checkpoint"))
    // with the session the same sync commits fine
    assert(DeltaLog.sync(root, t.currentManifest,
      spark = Some(spark)) == 1L)
  }
}

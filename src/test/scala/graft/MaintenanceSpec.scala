package graft

import graft.model._
import graft.streaming.MaintenanceDaemon
import graft.table._
import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/**
 * Periodic maintenance daemon semantics, mirroring the reference's
 * `table_handler_timer.rs:7-24` timers (mooncake-snapshot tick /
 * force-snapshot tick) as catalog-level scheduled maintenance.
 */
class MaintenanceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val schema = SchemaDsl.struct("id" -> "int64", "v" -> "int64")
  // huge mem slice: nothing auto-flushes, the tick has to do it
  private val tailOnlyCfg =
    TableConfig(memSliceSize = Int.MaxValue, walEnabled = true)

  private def mkCatalog(): GraftCatalog =
    GraftCatalog(spark, Files.createTempDirectory("graft-mt").toString)

  test("snapshot tick flushes exactly the dirty tables, once") {
    val cat = mkCatalog()
    val a = cat.createTable("a", schema, Identity.Keys(Seq("id")), tailOnlyCfg)
    val b = cat.createTable("b", schema, Identity.Keys(Seq("id")), tailOnlyCfg)
    a.insertAll(Seq(Row(1L, 10L), Row(2L, 20L)), startLsn = 1)
    val daemon = new MaintenanceDaemon(cat)
    assert(a.hasUnflushedCommitted && !b.hasUnflushedCommitted)
    val v0 = a.currentManifest.version
    assert(daemon.snapshotTick() == Seq("a"))
    assert(!a.hasUnflushedCommitted)
    assert(a.currentManifest.version == v0 + 1)
    // idle ticks are no-ops: no new manifest version on either table
    val (va, vb) = (a.currentManifest.version, b.currentManifest.version)
    assert(daemon.snapshotTick().isEmpty)
    assert(a.currentManifest.version == va &&
      b.currentManifest.version == vb)
    // the flushed state is manifest-durable: WAL-less reopen sees it
    val re = GraftTable.open(spark, a.root, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    assert(re.read().collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("maintenance tick compacts small-file debt past the threshold") {
    val cat = mkCatalog()
    val t = cat.createTable("t", schema, Identity.Keys(Seq("id")),
      TableConfig(memSliceSize = 2, walEnabled = false,
        compactSmallFileRows = 1000, compactFileCountThreshold = 4))
    // three tiny commits: small files exist but BELOW the count
    // threshold — the gated tick must leave them alone (the reference
    // compacts on thresholds, compaction_config.rs:48-55, never on the
    // timer itself)
    (0 until 3).foreach { i =>
      t.insertAll(Seq(Row(i.toLong, i.toLong)), startLsn = i * 2L + 1)
      t.flush(); t.publish()
    }
    val below = t.currentManifest
    assert(new MaintenanceDaemon(cat).maintenanceTick().isEmpty)
    assert(t.currentManifest.version == below.version)
    assert(t.currentManifest.dataFiles.map(_.path).sorted ==
      below.dataFiles.map(_.path).sorted)
    // three more commits trip the threshold -> the tick compacts
    (3 until 6).foreach { i =>
      t.insertAll(Seq(Row(i.toLong, i.toLong)), startLsn = i * 2L + 1)
      t.flush(); t.publish()
    }
    assert(t.currentManifest.dataFiles.size > 1)
    assert(new MaintenanceDaemon(cat).maintenanceTick() == Seq("t"))
    assert(t.currentManifest.dataFiles.size == 1)
    assert(t.read().count() == 6)
  }

  test("idle maintenance ticks publish nothing and rewrite nothing") {
    val cat = mkCatalog()
    val t = cat.createTable("t", schema, Identity.Keys(Seq("id")),
      TableConfig(memSliceSize = 2, walEnabled = false,
        compactSmallFileRows = 1000, compactFileCountThreshold = 4))
    (0 until 6).foreach { i =>
      t.insertAll(Seq(Row(i.toLong, i.toLong)), startLsn = i * 2L + 1)
      t.flush(); t.publish()
    }
    val daemon = new MaintenanceDaemon(cat)
    assert(daemon.maintenanceTick() == Seq("t")) // pays the debt once
    val steady = t.currentManifest
    val dataOnDisk = graft.format.Fio.list(s"${t.root}/data").sorted
    // N idle ticks: ZERO new manifest versions, ZERO files rewritten —
    // the file NAMES are identical, not just the row counts (a rewrite
    // always mints fresh names)
    (1 to 5).foreach(_ => assert(daemon.maintenanceTick().isEmpty))
    assert(t.currentManifest.version == steady.version,
      "idle ticks must not publish manifest versions")
    assert(t.currentManifest.dataFiles.map(_.path).sorted ==
      steady.dataFiles.map(_.path).sorted)
    assert(graft.format.Fio.list(s"${t.root}/data").sorted == dataOnDisk,
      "idle ticks must not touch data files on disk")
    // and the iceberg cadence sitting next to it stays quiet too
    assert(daemon.icebergTick() == Seq("t"))
    val m1 = graft.format.iceberg.IcebergSync.currentMetadataPath(t.root)
    daemon.maintenanceTick()
    assert(daemon.icebergTick().isEmpty)
    assert(graft.format.iceberg.IcebergSync.currentMetadataPath(t.root) == m1)
  }

  test("a started daemon leaves an idle table's version untouched") {
    val cat = mkCatalog()
    val t = cat.createTable("t", schema, Identity.Keys(Seq("id")),
      TableConfig(memSliceSize = 2, walEnabled = false))
    t.insertAll((0L until 4L).map(i => Row(i, i)), startLsn = 1)
    t.flush(); t.publish()
    // fast cadences: both timers fire many times across the window
    val daemon = new MaintenanceDaemon(cat, snapshotEveryMs = 20,
      maintenanceEveryMs = 40).start()
    try {
      Thread.sleep(150) // let any startup debt settle
      val v = t.currentManifest.version
      val files = t.currentManifest.dataFiles.map(_.path).sorted
      Thread.sleep(400) // >= 10 maintenance ticks
      assert(t.currentManifest.version == v,
        "an idle daemon interval must not grow the version log")
      assert(t.currentManifest.dataFiles.map(_.path).sorted == files)
    } finally daemon.stop()
  }

  test("expireVersions bounds the log; retention vacuum keeps the horizon") {
    val cat = mkCatalog()
    val t = cat.createTable("t", schema, Identity.Keys(Seq("id")),
      TableConfig(memSliceSize = 2, walEnabled = false,
        retainVersions = 2, compactSmallFileRows = 1000))
    (0 until 4).foreach { i =>
      t.upsertAll(Seq(Row(i.toLong, i * 10L)), startLsn = i * 3L + 1)
      t.flush(); t.publish()
    }
    val vs0 = graft.format.ManifestLog.versions(t.root)
    assert(t.expireVersions(keepLast = 3) == vs0.size - 3)
    val kept = graft.format.ManifestLog.versions(t.root)
    assert(kept == vs0.takeRight(3))
    intercept[Exception] {
      graft.format.ManifestLog.load(t.root, vs0.head)
    }
    // compaction rewrites files, then vacuum: the horizon's last two
    // versions must still re-materialize, the third (outside
    // retainVersions=2) may lose its exclusive files
    t.optimize(); t.vacuum()
    val horizon = graft.format.ManifestLog.versions(t.root).takeRight(2)
    horizon.foreach { v =>
      assert(t.readAsOfVersion(v).count() >= 0) // scan materializes
    }
    assert(t.read().count() == 4)
    intercept[IllegalArgumentException] { t.expireVersions(0) }
  }

  test("maintenance tick bounds the manifest version log") {
    val cat = mkCatalog()
    val t = cat.createTable("t", schema, Identity.Keys(Seq("id")),
      TableConfig(memSliceSize = 2, walEnabled = false,
        compactSmallFileRows = 1000, compactFileCountThreshold = 4,
        expireKeepVersions = 5))
    // 12 one-row commits: 12 small files, 12+ manifest versions — the
    // continuous-ingest shape that grows the log one vN.json per commit
    (0 until 12).foreach { i =>
      t.insertAll(Seq(Row(i.toLong, i * 10L)), startLsn = i * 2L + 1)
      t.flush(); t.publish()
    }
    assert(graft.format.ManifestLog.versions(t.root).size > 5)
    assert(new MaintenanceDaemon(cat).maintenanceTick() == Seq("t"))
    // the tick paid the compaction debt AND bounded the log
    val kept = graft.format.ManifestLog.versions(t.root)
    assert(kept.size <= 5,
      s"expireKeepVersions=5 must bound the log, got ${kept.size}")
    assert(kept.max == t.currentManifest.version)
    assert(t.read().count() == 12)
    // a table at steady state (compacted, log within bounds) is idle
    assert(new MaintenanceDaemon(cat).maintenanceTick().isEmpty)
    assert(graft.format.ManifestLog.versions(t.root) == kept)
    // expiry is metadata-only: with expiry DISABLED (0) nothing retires
    val u = cat.createTable("u", schema, Identity.Keys(Seq("id")),
      TableConfig(memSliceSize = 2, walEnabled = false,
        compactSmallFileRows = 1000, compactFileCountThreshold = 4,
        expireKeepVersions = 0))
    (0 until 8).foreach { i =>
      u.insertAll(Seq(Row(i.toLong, i * 10L)), startLsn = i * 2L + 1)
      u.flush(); u.publish()
    }
    val before = graft.format.ManifestLog.versions(u.root).size
    new MaintenanceDaemon(cat).maintenanceTick()
    // compaction may add a version, but none may be expired
    assert(graft.format.ManifestLog.versions(u.root).size >= before)
  }

  test("started daemon ticks on its own schedule until stopped") {
    val cat = mkCatalog()
    val t = cat.createTable("t", schema, Identity.Keys(Seq("id")), tailOnlyCfg)
    val daemon = new MaintenanceDaemon(cat, snapshotEveryMs = 50,
      maintenanceEveryMs = 3600000).start()
    try {
      t.insertAll(Seq(Row(7L, 70L)), startLsn = 1)
      val deadline = System.currentTimeMillis() + 15000
      while (t.hasUnflushedCommitted && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(!t.hasUnflushedCommitted, "timer never flushed the tail")
    } finally daemon.stop()
    // after stop, new committed tail rows stay (no rogue thread)
    t.insertAll(Seq(Row(8L, 80L)), startLsn = 10)
    Thread.sleep(200)
    assert(t.hasUnflushedCommitted)
  }

  test("iceberg tick publishes a spec snapshot only when state moved") {
    val cat = mkCatalog()
    val t = cat.createTable("ice", schema, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    t.upsertAll((1L to 20L).map(i => Row(i, i)), startLsn = 1)
    t.flush(); t.publish()
    val daemon = new MaintenanceDaemon(cat)
    assert(daemon.icebergTick() == Seq("ice"))
    val m1 = graft.format.iceberg.IcebergSync.currentMetadataPath(t.root).get
    val st1 = graft.format.iceberg.IcebergSync.readState(m1)
    assert(st1.dataFiles.nonEmpty)
    // idle tick: nothing changed, no new snapshot (no version spam)
    assert(daemon.icebergTick().isEmpty)
    assert(graft.format.iceberg.IcebergSync.currentMetadataPath(t.root)
      .contains(m1))
    // a delete moves the DV accounting -> next tick syncs again and the
    // new snapshot's reconstruction reflects it
    t.apply(Seq(Delete(Seq(5L), 100L), Commit(101L)))
    t.flush(); t.publish()
    assert(daemon.icebergTick() == Seq("ice"))
    val m2 = graft.format.iceberg.IcebergSync.currentMetadataPath(t.root).get
    assert(m2 != m1)
    val df = graft.format.iceberg.IcebergSync.readDataFrame(spark, m2)
    assert(df.count() == 19L && df.where("id = 5").count() == 0L)
  }
}

package graft

import graft.model._
import graft.sources.GraftCatalogPlugin
import graft.table._
import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/**
 * Spark V2 catalog over a graft warehouse — the DataFusion
 * catalog/schema-provider integration (`moonlink_datafusion/src/
 * catalog_provider.rs`, `schema_provider.rs`) re-expressed as a
 * `TableCatalog`: three-part-name SQL over live graft tables.
 */
class CatalogPluginSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val schema = SchemaDsl.struct("id" -> "int64", "v" -> "int64")

  private def freshCatalog(): (String, String) = {
    val wh = Files.createTempDirectory("graft-v2cat").toString
    val name = "gc" + math.abs(wh.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalogPlugin].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    (name, wh)
  }

  test("three-part-name SQL resolves registered graft tables") {
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh) // database "graft"
    val t = cat.createTable("kv", schema, Identity.Keys(Seq("id")))
    t.upsertAll(Seq(Row(1L, 10L), Row(2L, 20L), Row(1L, 11L)), startLsn = 1)
    t.flush(); t.publish()
    val rows = spark.sql(
      s"SELECT id, v FROM $cname.graft.kv ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 11L), (2L, 20L)))
    // predicate through the same vectorized DSv2 path
    assert(spark.sql(
      s"SELECT v FROM $cname.graft.kv WHERE id = 2").head().getLong(0) == 20L)
    // SHOW surfaces mirror the registry
    assert(spark.sql(s"SHOW NAMESPACES IN $cname").collect()
      .map(_.getString(0)).toSeq == Seq("graft"))
    assert(spark.sql(s"SHOW TABLES IN $cname.graft").collect()
      .map(_.getString(1)).toSeq == Seq("kv"))
  }

  test("SQL DDL creates a keyed table the ingest API can open") {
    val (cname, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cname.graft.t2 (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id')")
    val entry = new MetadataStore(wh).allEntries().find(_.table == "t2").get
    assert(entry.identity == Identity.Keys(Seq("id")))
    val t = GraftTable.open(spark, s"$wh/t2", entry.identity, entry.config)
    t.upsertAll(Seq(Row(5L, 50L)), startLsn = 1)
    t.flush(); t.publish()
    assert(spark.sql(s"SELECT v FROM $cname.graft.t2").head().getLong(0) == 50L)
    // DROP removes registry entry and storage
    spark.sql(s"DROP TABLE $cname.graft.t2")
    assert(new MetadataStore(wh).allEntries().isEmpty)
    assert(!graft.format.Fio.exists(s"$wh/t2/manifest"))
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF") {
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh)
    val t = cat.createTable("tt", schema, Identity.Keys(Seq("id")))
    t.upsertAll(Seq(Row(1L, 10L)), startLsn = 1)
    t.flush(); val v1 = t.publish()
    Thread.sleep(1100) // mtime resolution can be a full second
    val midMs = System.currentTimeMillis()
    Thread.sleep(1100)
    t.upsertAll(Seq(Row(1L, 99L), Row(2L, 20L)), startLsn = 10)
    t.flush(); t.publish()
    // current state vs pinned version
    assert(spark.sql(s"SELECT count(*) FROM $cname.graft.tt")
      .head().getLong(0) == 2L)
    val pinned = spark.sql(
      s"SELECT id, v FROM $cname.graft.tt VERSION AS OF $v1").collect()
    assert(pinned.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L)))
    // timestamp between the two commits resolves to the first version
    val ts = java.time.Instant.ofEpochMilli(midMs).toString.replace("T", " ")
      .stripSuffix("Z")
    val asOf = spark.sql(s"SELECT id, v FROM $cname.graft.tt " +
      s"TIMESTAMP AS OF '$ts'").collect()
    assert(asOf.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L)))
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $cname.graft.tt VERSION AS OF 99").collect()
    }
  }

  test("INSERT INTO appends through staged files on append-only tables") {
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh)
    cat.createTable("logt", schema, Identity.None,
      TableConfig(walEnabled = false))
    spark.sql(s"INSERT INTO $cname.graft.logt VALUES (1, 10), (2, 20)")
    spark.sql(s"INSERT INTO $cname.graft.logt SELECT id, id * 100 " +
      "FROM range(3, 6)")
    val got = spark.sql(
      s"SELECT id, v FROM $cname.graft.logt ORDER BY id").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L), (2L, 20L), (3L, 300L), (4L, 400L), (5L, 500L)))
    // each INSERT is one atomic manifest commit at its own LSN
    val t = GraftTable.open(spark, s"$wh/logt", Identity.None,
      TableConfig(walEnabled = false))
    assert(t.commitLsn == 2L)
    // keyed tables refuse SQL INSERT (writes go through the ingest API)
    val kt = cat.createTable("keyedt", schema, Identity.Keys(Seq("id")))
    kt.upsertAll(Seq(Row(1L, 1L)), startLsn = 1); kt.flush(); kt.publish()
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $cname.graft.keyedt VALUES (9, 9)")
    }
    assert(e.getMessage.contains("does not support append") ||
      e.getMessage.contains("keyed"))
  }

  test("SQL DELETE FROM runs as the metadata-only CDC delete path") {
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh)
    val t = cat.createTable("dl", schema, Identity.Keys(Seq("id")))
    t.upsertAll((1L to 6L).map(i => Row(i, i * 10L)), startLsn = 1)
    t.flush(); t.publish()
    // simple predicate: lowered to delete events + DV masks
    spark.sql(s"DELETE FROM $cname.graft.dl WHERE v >= 50")
    assert(spark.sql(s"SELECT id FROM $cname.graft.dl ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    // compound predicate with IN / AND / OR translates too
    spark.sql(s"DELETE FROM $cname.graft.dl " +
      "WHERE id IN (1, 2) AND v < 15 OR id = 4")
    assert(spark.sql(s"SELECT id FROM $cname.graft.dl ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
    // no data file was rewritten: the 4 deleted rows are DV masks on
    // the original file set
    val m = graft.format.ManifestLog.loadLatest(s"$wh/dl").get
    assert(m.dataFiles.map(_.deletes).sum == 4L)
    assert(m.liveRows == 2L)
    // append-only tables refuse SQL DELETE instead of guessing
    cat.createTable("al", schema, Identity.None,
      TableConfig(walEnabled = false))
    spark.sql(s"INSERT INTO $cname.graft.al VALUES (1, 10)")
    val e = intercept[Exception] {
      spark.sql(s"DELETE FROM $cname.graft.al WHERE id = 1")
    }
    assert(e.getMessage.toLowerCase.contains("delete"))
  }

  test("SQL UPDATE runs as a delta-based row-level operation") {
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh)
    val t = cat.createTable("up", schema, Identity.Keys(Seq("id")))
    t.upsertAll((1L to 5L).map(i => Row(i, i * 10L)), startLsn = 1)
    t.flush(); t.publish()
    spark.sql(s"UPDATE $cname.graft.up SET v = v + 1000 WHERE id >= 4")
    assert(spark.sql(s"SELECT id, v FROM $cname.graft.up ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 1040L), (5L, 1050L)))
    // the update is merge-on-read: old versions DV-masked, not rewritten
    val m = graft.format.ManifestLog.loadLatest(s"$wh/up").get
    assert(m.dataFiles.map(_.deletes).sum == 2L)
    // a second UPDATE over the updated state composes
    spark.sql(s"UPDATE $cname.graft.up SET v = 0 WHERE v > 1000")
    assert(spark.sql(s"SELECT sum(v) FROM $cname.graft.up")
      .head().getLong(0) == 60L)
  }

  test("SQL MERGE INTO upserts and deletes through one commit") {
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh)
    val t = cat.createTable("mg", schema, Identity.Keys(Seq("id")))
    t.upsertAll(Seq(Row(1L, 10L), Row(2L, 20L), Row(3L, 30L)), startLsn = 1)
    t.flush(); t.publish()
    import spark.implicits._
    Seq((2L, 200L), (3L, -1L), (4L, 40L)).toDF("id", "v")
      .createOrReplaceTempView("mg_src")
    val beforeLsn = graft.format.ManifestLog.loadLatest(s"$wh/mg").get.commitLsn
    spark.sql(
      s"""MERGE INTO $cname.graft.mg t USING mg_src s ON t.id = s.id
         |WHEN MATCHED AND s.v < 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET t.v = s.v
         |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
         |""".stripMargin)
    assert(spark.sql(s"SELECT id, v FROM $cname.graft.mg ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L), (2L, 200L), (4L, 40L)))
    // the whole MERGE (delete + update + insert) landed as ONE snapshot
    // at ONE new LSN (open's WAL catch-up may add a recovery version at
    // the OLD lsn, so count versions that advanced the commit LSN)
    val vs = graft.format.ManifestLog.versions(s"$wh/mg")
      .map(v => graft.format.ManifestLog.load(s"$wh/mg", v).commitLsn)
    assert(vs.count(_ > beforeLsn) == 1)
  }

  test("SQL UPDATE/MERGE over decimal columns stage exactly; pushed SUM agrees") {
    // decimals thread the whole row-level pipeline: the executor-side
    // JSONL staging (WAL codec), the fold, the per-file exact decimal
    // sums, and — after refresh_stats — the pushed SUM over the result
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh)
    val t = cat.createTable("dec",
      SchemaDsl.struct("id" -> "int64", "amt" -> "decimal(12,2)"),
      Identity.Keys(Seq("id")))
    def bd(c: Long) = new java.math.BigDecimal(
      java.math.BigInteger.valueOf(c), 2)
    t.upsertAll((1L to 6L).map(i => Row(i, bd(i * 150L))), startLsn = 1)
    t.flush(); t.publish()
    // UPDATE with decimal arithmetic: exact on both write and read
    spark.sql(s"UPDATE $cname.graft.dec SET amt = amt * 2 WHERE id <= 2")
    val got = spark.sql(
      s"SELECT id, CAST(amt AS STRING) a FROM $cname.graft.dec ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(1L -> "3.00", 2L -> "6.00", 3L -> "4.50",
      4L -> "6.00", 5L -> "7.50", 6L -> "9.00"), got.toString)
    // MERGE mixes update/delete/insert with decimal values in one commit
    import spark.implicits._
    Seq((5L, "100.25"), (6L, ""), (7L, "7.77")).toDF("id", "a")
      .selectExpr("id", "CAST(nullif(a, '') AS DECIMAL(12,2)) AS amt")
      .createOrReplaceTempView("dec_src")
    spark.sql(
      s"""MERGE INTO $cname.graft.dec t USING dec_src s ON t.id = s.id
         |WHEN MATCHED AND s.amt IS NULL THEN DELETE
         |WHEN MATCHED THEN UPDATE SET t.amt = s.amt
         |WHEN NOT MATCHED THEN INSERT (id, amt) VALUES (s.id, s.amt)
         |""".stripMargin)
    val want = Seq("3.00", "6.00", "4.50", "6.00", "100.25", "7.77")
      .map(new java.math.BigDecimal(_))
      .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
    // refresh folds the update/merge DVs; SUM pushes and equals exactly
    spark.sql(s"CALL $cname.system.refresh_stats('graft', 'dec')")
    val q = spark.read.format("graft").load(s"$wh/dec")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("amt")))
    assert(q.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "post-merge refreshed decimal SUM must push")
    assert(q.head().getDecimal(0).compareTo(want) == 0)
  }

  test("metadata tables resolve as t$history and t$files") {
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh)
    val t = cat.createTable("mt", schema, Identity.Keys(Seq("id")))
    t.upsertAll(Seq(Row(1L, 10L), Row(2L, 20L)), startLsn = 1)
    t.flush(); t.publish()
    t.apply(Seq(Delete(Seq(2L), 10L), Commit(11L)))
    t.flush(); t.publish()
    // history: one row per manifest version, live_rows tracks the fold
    val hist = spark.sql(s"SELECT version, live_rows " +
      s"FROM $cname.graft.`mt$$history` ORDER BY version").collect()
    assert(hist.length >= 3)
    assert(hist.last.getLong(1) == 1L)
    // files: current accounting — SQL aggregation over metadata works
    val files = spark.sql(s"SELECT sum(rows), sum(deletes), sum(live_rows) " +
      s"FROM $cname.graft.`mt$$files`").head()
    assert(files.getLong(0) == 2L && files.getLong(1) == 1L &&
      files.getLong(2) == 1L)
    // unknown base or suffix still fails analysis
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $cname.graft.`nope$$history`").collect()
    }
  }

  test("SQL ALTER TABLE drives the schema-evolution verbs") {
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh)
    val t = cat.createTable("al2",
      SchemaDsl.struct("id" -> "int64", "v" -> "int32"),
      Identity.Keys(Seq("id")))
    t.upsertAll(Seq(Row(1L, 10)), startLsn = 1)
    t.flush(); t.publish()
    // ADD: pre-alter rows read NULL for the new column, no rewrite
    spark.sql(s"ALTER TABLE $cname.graft.al2 ADD COLUMN note STRING")
    val r1 = spark.sql(s"SELECT id, v, note FROM $cname.graft.al2").head()
    assert(r1.getLong(0) == 1L && r1.getInt(1) == 10 && r1.isNullAt(2))
    // RENAME: data reachable under the new name
    spark.sql(s"ALTER TABLE $cname.graft.al2 RENAME COLUMN v TO val")
    assert(spark.sql(s"SELECT val FROM $cname.graft.al2").head().getInt(0) == 10)
    // WIDEN int32 -> int64: old int32 files upcast at read
    spark.sql(s"ALTER TABLE $cname.graft.al2 ALTER COLUMN val TYPE BIGINT")
    assert(spark.sql(s"SELECT val FROM $cname.graft.al2").head().getLong(0) == 10L)
    // DROP: analysis no longer sees the column
    spark.sql(s"ALTER TABLE $cname.graft.al2 DROP COLUMN note")
    intercept[Exception] {
      spark.sql(s"SELECT note FROM $cname.graft.al2").collect()
    }
    // key columns cannot widen (index/DV join invariants)
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cname.graft.al2 ALTER COLUMN id TYPE DECIMAL(20,0)")
    }
    assert(e.getMessage.toLowerCase.contains("key") ||
      e.getMessage.toLowerCase.contains("widen"))
  }

  test("DELETE with a subquery routes through row-level operations") {
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh)
    val t = cat.createTable("dl2", schema, Identity.Keys(Seq("id")))
    t.upsertAll((1L to 8L).map(i => Row(i, i * 10L)), startLsn = 1)
    t.flush(); t.publish()
    import spark.implicits._
    Seq(2L, 4L, 6L).toDF("kill_id").createOrReplaceTempView("dl2_kill")
    // an IN-subquery predicate cannot become a source filter, so
    // canDeleteWhere refuses and Spark falls back to the delta-based
    // row-level DELETE (key-only "d" events through the same fold)
    spark.sql(s"DELETE FROM $cname.graft.dl2 " +
      "WHERE id IN (SELECT kill_id FROM dl2_kill)")
    assert(spark.sql(s"SELECT id FROM $cname.graft.dl2 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L, 5L, 7L, 8L))
    // still merge-on-read: three DV masks, no rewrite
    val m = graft.format.ManifestLog.loadLatest(s"$wh/dl2").get
    assert(m.dataFiles.map(_.deletes).sum == 3L)
  }

  test("chaos: SQL UPDATE is atomic under injected IO faults") {
    // storage faults at random mutating-Fio points during the delta
    // write (staged JSONL, batch files, manifest commit): every UPDATE
    // attempt must be all-or-nothing — after any mix of successes and
    // injected crashes, all rows carry the SAME number of applied
    // updates, and a fault-free retry always lands.
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh)
    val t = cat.createTable("chx", schema, Identity.Keys(Seq("id")))
    t.upsertAll((1L to 5L).map(i => Row(i, 0L)), startLsn = 1)
    t.flush(); t.publish()
    val rnd = new scala.util.Random(77L)
    val faults = new graft.format.FioFaults {
      @volatile var armed = false
      override def beforeOp(op: String, path: String): Unit =
        if (armed && rnd.nextDouble() < 0.15)
          throw new java.io.IOException(s"injected fault: $op $path")
    }
    graft.format.Fio.installFaults(wh, faults)
    def state(): Long = {
      val vs = spark.sql(s"SELECT v FROM $cname.graft.chx")
        .collect().map(_.getLong(0)).toSet
      // the atomicity invariant: never a partial update
      assert(vs.size == 1, s"partial update visible: $vs")
      assert(vs.head % 1000 == 0)
      vs.head
    }
    try {
      (1 to 6).foreach { _ =>
        faults.armed = true
        val before = state()
        val ok = try {
          spark.sql(s"UPDATE $cname.graft.chx SET v = v + 1000"); true
        } catch { case _: Throwable => false }
        faults.armed = false
        val after = state()
        // a success applied exactly once; a reported failure is either
        // no-commit or full-commit (a fault AFTER the manifest commit —
        // e.g. in staging cleanup — is an ambiguous outcome whose data
        // effect already landed atomically)
        if (ok) assert(after == before + 1000L)
        else assert(after == before || after == before + 1000L)
      }
    } finally graft.format.Fio.clearFaults()
    // fault-free retry always succeeds and lands exactly once
    val before = state()
    spark.sql(s"UPDATE $cname.graft.chx SET v = v + 1000")
    assert(state() == before + 1000L)
  }

  test("CALL procedures drive the maintenance verbs with result rows") {
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh)
    val t = cat.createTable("pr", schema, Identity.Keys(Seq("id")))
    // several small commits -> several files + versions to maintain
    (1 to 4).foreach { i =>
      t.upsertAll(Seq(Row(i.toLong, i * 10L)), startLsn = i * 10L)
      t.flush(); t.publish()
    }
    val before = graft.format.ManifestLog.versions(s"$wh/pr").size
    // optimize: compacts the 4 single-row files
    val opt = spark.sql(
      s"CALL $cname.system.optimize(db => 'graft', tbl => 'pr')").head()
    assert(opt.getLong(0) == 4L && opt.getLong(1) == 1L)
    // clustered + z-ordered variant through named args
    spark.sql(s"CALL $cname.system.optimize(db => 'graft', tbl => 'pr', " +
      "cluster_by => 'id', zorder => 'false')").collect()
    // expire + vacuum: drop history, reclaim unreferenced files
    val exp = spark.sql(
      s"CALL $cname.system.expire_snapshots('graft', 'pr', 1)").head()
    assert(exp.getLong(0) > 0L)
    val vac = spark.sql(s"CALL $cname.system.vacuum('graft', 'pr')").head()
    assert(vac.getLong(0) >= 0L)
    // the pre-compaction files are gone from disk (reclaimed by vacuum
    // or by the maintenance handle's orphan sweep at open)
    assert(graft.format.Fio.list(s"$wh/pr/data").size == 1)
    // table content untouched by maintenance
    assert(spark.sql(s"SELECT sum(v) FROM $cname.graft.pr")
      .head().getLong(0) == 100L)
    assert(graft.format.ManifestLog.versions(s"$wh/pr").size < before + 2)
    intercept[Exception] {
      spark.sql(s"CALL $cname.system.nope('graft', 'pr')").collect()
    }
  }

  test("CALL system.delta_sync + delta_checkpoint: export, bound, continue") {
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh)
    val t = cat.createTable("dl", schema, Identity.Keys(Seq("id")))
    (1 to 3).foreach { i =>
      t.upsertAll(Seq(Row(i.toLong, i * 10L)), startLsn = i * 10L)
      t.flush(); t.publish()
      spark.sql(s"CALL $cname.system.delta_sync('graft', 'dl')").collect()
    }
    val root = s"$wh/dl"
    assert(graft.format.delta.DeltaLog.versions(root) == Seq(0L, 1L, 2L))
    val ck = spark.sql(
      s"CALL $cname.system.delta_checkpoint('graft', 'dl')").head()
    assert(ck.getLong(0) == 2L, "checkpoint at the current version")
    assert(ck.getLong(1) == 3L, "the three superseded JSON commits expire")
    assert(graft.format.delta.DeltaLog.versions(root).isEmpty)
    // the export still reads whole from the checkpoint alone...
    assert(graft.format.delta.DeltaLog.readDataFrame(spark, root)
      .count() == 3L)
    // ...and the next sync claims the right next version from it
    t.upsertAll(Seq(Row(9L, 90L)), startLsn = 100L); t.flush(); t.publish()
    val v = spark.sql(
      s"CALL $cname.system.delta_sync('graft', 'dl')").head().getLong(0)
    assert(v == 3L)
    assert(graft.format.delta.DeltaLog.readStateFromCheckpoint(spark, root)
      .files.map(_.numRecords).sum == 4L)
  }

  test("CALL system.check reports integrity; detects tampered storage") {
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh)
    val t = cat.createTable("ck", schema, Identity.Keys(Seq("id")))
    t.upsertAll((1L to 5L).map(i => Row(i, i)), startLsn = 1)
    t.flush(); t.publish()
    t.apply(Seq(Delete(Seq(2L), 10L), Commit(11L)))
    t.flush(); t.publish()
    def checks() = spark.sql(s"CALL $cname.system.check('graft', 'ck')")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    def checkDetail(name: String) =
      spark.sql(s"CALL $cname.system.check('graft', 'ck')")
        .collect().find(_.getString(0) == name).get.getString(2)
    // the un-refreshed delete leaves the masked-row accounting stale:
    // the currency row must SURFACE the aggregate-pushdown backlog
    // (count + unaccounted masked rows), the bucket-layout row's
    // sibling for M15 operators
    val c0 = checks()
    assert(!c0("dv-stats-currency"), s"stale accounting must be visible: $c0")
    assert(checkDetail("dv-stats-currency") ==
      "stale_files=1 masked_rows=1", checkDetail("dv-stats-currency"))
    // CALL system.refresh_stats heals it — and every other row is green
    spark.sql(s"CALL $cname.system.refresh_stats('graft', 'ck')")
    val c1 = checks()
    assert(c1.size >= 6 && c1.values.forall(identity), s"clean table: $c1")
    assert(checkDetail("dv-stats-currency") == "stale_files=0 masked_rows=0")
    // tamper: delete a data file behind the manifest's back
    val victim = graft.format.ManifestLog.loadLatest(s"$wh/ck")
      .get.dataFiles.head.path
    graft.format.Fio.delete(s"$wh/ck/data/$victim")
    val c2 = checks()
    assert(!c2("files-present"), s"tamper undetected: $c2")
    // unbucketed tables have no bucket-layout row at all
    assert(!c1.contains("bucket-layout"))
    // bucket-layout DECAY is surfaced: sub-floor scattered micro-
    // flushes legally write unbucketed files (losing zero-exchange SPJ
    // until maintenance) and the check must make that drift visible
    val t2 = cat.createTable("ck2", schema, Identity.Keys(Seq("id")))
    t2.upsertAll((1L to 300L).map(i => Row(i, i)), startLsn = 1)
    t2.flush(); t2.publish()
    t2.optimize(bucketBy = Some(4))
    def checks2() = spark.sql(s"CALL $cname.system.check('graft', 'ck2')")
      .collect()
      .map(r => r.getString(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    val b1 = checks2()
    assert(b1("bucket-layout")._1, s"fresh layout must report clean: $b1")
    t2.upsertAll((1001L to 1008L).map(i => Row(i, i)), startLsn = 400L)
    t2.flush(); t2.publish()
    val b2 = checks2()
    assert(!b2("bucket-layout")._1 &&
      b2("bucket-layout")._2.contains("unbucketed=1"),
      s"layout decay must be visible: $b2")
    // escalated compaction re-buckets the tail and the report heals
    t2.compact(force = true); t2.publish()
    val b3 = checks2()
    assert(b3("bucket-layout")._1, s"compaction must restore the layout: $b3")
  }

  test("CALL system.refresh_stats re-arms aggregate pushdown after deletes") {
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh)
    val t = cat.createTable("rs", schema, Identity.Keys(Seq("id")))
    t.upsertAll((1L to 10L).map(i => Row(i, i * 10)), startLsn = 1)
    t.flush(); t.publish()
    t.apply(Seq(Delete(Seq(1L), 20L), Commit(21L)))
    t.flush(); t.publish()
    import org.apache.spark.sql.functions.{col, count, min, sum}
    def planOf() = spark.read.format("graft").load(s"$wh/rs")
      .agg(count(col("v")), sum(col("v")), min(col("v")))
      .queryExecution.executedPlan.toString
    assert(!planOf().contains("GraftAggScan"),
      "stale accounting must decline before the refresh")
    val n = spark.sql(s"CALL $cname.system.refresh_stats('graft', 'rs')")
      .head().getLong(0)
    assert(n == 1L, s"one delete-carrying file expected, got $n")
    assert(planOf().contains("GraftAggScan"),
      "the SQL refresh must re-arm the aggregate pushdown")
    // idempotent: nothing stale on the second call
    assert(spark.sql(s"CALL $cname.system.refresh_stats('graft', 'rs')")
      .head().getLong(0) == 0L)
    val r = spark.read.format("graft").load(s"$wh/rs")
      .agg(count(col("v")), sum(col("v")), min(col("v"))).head()
    assert(r.getLong(0) == 9L && r.getLong(1) == 540L && r.getLong(2) == 20L)
  }

  test("CALL system.maintain is threshold-gated: idle tables untouched") {
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh)
    val t = cat.createTable("mt", schema, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false, compactSmallFileRows = 1000,
        compactFileCountThreshold = 4))
    (0 until 6).foreach { i =>
      t.upsertAll(Seq(Row(i.toLong, i.toLong)), startLsn = i * 2L + 1)
      t.flush(); t.publish()
    }
    def call() = spark.sql(s"CALL $cname.system.maintain('graft', 'mt')")
      .head().getBoolean(0)
    assert(call(), "6 small files past threshold 4 must compact")
    val m1 = graft.format.ManifestLog.loadLatest(s"$wh/mt").get
    assert(m1.dataFiles.size == 1)
    // idle: ran=false, no version growth, identical file names
    assert(!call() && !call(), "idle maintain must be a no-op")
    val m2 = graft.format.ManifestLog.loadLatest(s"$wh/mt").get
    assert(m2.version == m1.version &&
      m2.dataFiles.map(_.path) == m1.dataFiles.map(_.path))
  }

  test("catalog functions expose the native kernels to SQL") {
    val (cname, _) = freshCatalog()
    // jaccard over sorted distinct int arrays: |{2,3}| / |{1,2,3,4}|
    assert(spark.sql(s"SELECT $cname.system.jaccard_milli(" +
      "array(1, 2, 3), array(2, 3, 4))").head().getLong(0) == 500L)
    // identical arrays -> 1000; disjoint -> 0; null -> null
    assert(spark.sql(s"SELECT $cname.system.jaccard_milli(" +
      "array(7), array(7))").head().getLong(0) == 1000L)
    assert(spark.sql(s"SELECT $cname.system.jaccard_milli(" +
      "array(1), array(2))").head().getLong(0) == 0L)
    // in-order IEEE dot product
    assert(spark.sql(s"SELECT $cname.system.dot(" +
      "array(1.0D, 2.0D), array(3.0D, 4.0D))").head().getDouble(0) == 11.0)
    // ragged pair -> null (no partial dot)
    assert(spark.sql(s"SELECT $cname.system.dot(" +
      "array(1.0D), array(1.0D, 2.0D))").head().isNullAt(0))
    // the function result must equal the codegen'd expression's
    import spark.implicits._
    val df = Seq((Seq(1, 2, 3), Seq(2, 3, 4))).toDF("a", "b")
    df.createOrReplaceTempView("jv")
    val viaSql = spark.sql(
      s"SELECT $cname.system.jaccard_milli(a, b) FROM jv").head().getLong(0)
    val viaExpr = df.select(org.apache.spark.sql.graft.JaccardMilli
      .asColumn(org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b"))).head().getLong(0)
    assert(viaSql == viaExpr)
    intercept[Exception] {
      spark.sql(s"SELECT $cname.system.nope(1)").collect()
    }
  }

  test("UPDATE that moves a key executes as delete(old) + upsert(new)") {
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh)
    val t = cat.createTable("km", schema, Identity.Keys(Seq("id")))
    t.upsertAll(Seq(Row(1L, 10L), Row(2L, 20L), Row(3L, 30L)), startLsn = 1)
    t.flush(); t.publish()
    // row identity moves: the old key's version is DV-deleted, the new
    // key appends (Iceberg/Delta run key-moving updates the same way)
    spark.sql(s"UPDATE $cname.graft.km SET id = id + 100 WHERE id = 1")
    assert(spark.sql(s"SELECT id, v FROM $cname.graft.km ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((2L, 20L), (3L, 30L), (101L, 10L)))
    // same-statement key SWAP: each old version deleted against the
    // PRE-statement table (the d events order one LSN before the
    // statement's appends), both new versions land
    spark.sql(s"UPDATE $cname.graft.km SET id = 5 - id WHERE id IN (2, 3)")
    assert(spark.sql(s"SELECT id, v FROM $cname.graft.km ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((2L, 30L), (3L, 20L), (101L, 10L)))
    // moving ONTO an existing untouched key overwrites it (upsert
    // identity: one live version per key, never a duplicate)
    spark.sql(s"UPDATE $cname.graft.km SET id = 3 WHERE id = 101")
    assert(spark.sql(s"SELECT id, v FROM $cname.graft.km ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((2L, 30L), (3L, 10L)))
  }

  test("unknown table fails analysis, not execution") {
    val (cname, _) = freshCatalog()
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cname.graft.nope").collect()
    }
    assert(e.getMessage.toLowerCase.contains("table"))
  }

  test("same-named tables in different databases get distinct roots") {
    val (cname, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cname.db1.t (id BIGINT, v BIGINT)")
    spark.sql(s"CREATE TABLE $cname.db2.t (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $cname.db1.t VALUES (1, 10)")
    spark.sql(s"INSERT INTO $cname.db2.t VALUES (2, 20)")
    assert(spark.sql(s"SELECT id FROM $cname.db1.t").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    assert(spark.sql(s"SELECT id FROM $cname.db2.t").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    // physically separate directories (non-default dbs nest)
    assert(graft.format.Fio.exists(s"$wh/db1/t/manifest"))
    assert(graft.format.Fio.exists(s"$wh/db2/t/manifest"))
    // procedures resolve through the SAME db-qualified root
    spark.sql(s"CALL $cname.system.flush(db => 'db1', tbl => 't')")
    spark.sql(s"DROP TABLE $cname.db1.t")
    assert(!graft.format.Fio.exists(s"$wh/db1/t/manifest"))
    assert(spark.sql(s"SELECT id FROM $cname.db2.t").count() == 1L)
  }

  test("CALL system.iceberg_sync publishes a readable Iceberg snapshot") {
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh)
    val t = cat.createTable("isync", schema, Identity.Keys(Seq("id")))
    t.upsertAll((1L to 10L).map(i => Row(i, i * 2L)), startLsn = 1)
    t.flush(); t.publish()
    val r = spark.sql(
      s"CALL $cname.system.iceberg_sync(db => 'graft', tbl => 'isync')")
      .head()
    assert(r.getLong(2) == 1L, "first sync is sequence 1")
    val df = graft.format.iceberg.IcebergSync.readDataFrame(spark,
      r.getString(0))
    assert(df.count() == 10L)
    assert(df.where("id = 4").head().getLong(1) == 8L)
  }
}

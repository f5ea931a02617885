package graft

import graft.model._
import graft.sources.GraftCatalogPlugin
import graft.table._
import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** SQL write-surface completion: CTAS, INSERT OVERWRITE (one atomic
 *  truncate+append commit), and TRUNCATE TABLE — each metadata-cheap,
 *  each leaving history time-travelable (snapshot isolation).
 */
class SqlWriteSurfaceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sqlwrite-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshCatalog(): (String, String) = {
    val wh = Files.createTempDirectory("graft-sqlw").toString
    val name = "gw" + math.abs(wh.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalogPlugin].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    (name, wh)
  }

  test("CREATE TABLE AS SELECT lands rows through create + adopt") {
    val (cname, wh) = freshCatalog()
    spark.range(1, 11).selectExpr("id", "id * 3 AS v")
      .createOrReplaceTempView("ctas_src")
    spark.sql(s"CREATE TABLE $cname.graft.cts AS SELECT * FROM ctas_src")
    val rows = spark.sql(
      s"SELECT id, v FROM $cname.graft.cts ORDER BY id").collect()
    assert(rows.length == 10 && rows.forall(r => r.getLong(1) == r.getLong(0) * 3))
    // the registry entry exists like any DDL-created table
    assert(new MetadataStore(wh).allEntries().exists(_.table == "cts"))
  }

  test("INSERT OVERWRITE replaces content in one atomic version") {
    val (cname, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cname.graft.ow (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $cname.graft.ow VALUES (1, 10), (2, 20), (3, 30)")
    val vBefore = spark.sql(s"SELECT max(version) FROM $cname.graft.`ow$$history`")
      .head().getLong(0)
    spark.sql(s"INSERT OVERWRITE $cname.graft.ow VALUES (7, 70), (8, 80)")
    // new state is exactly the overwrite set
    assert(spark.sql(s"SELECT id, v FROM $cname.graft.ow ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((7L, 70L), (8L, 80L)))
    // truncate+append committed as ONE version: history grew by exactly 1
    val vAfter = spark.sql(s"SELECT max(version) FROM $cname.graft.`ow$$history`")
      .head().getLong(0)
    assert(vAfter == vBefore + 1,
      s"overwrite took ${vAfter - vBefore} versions, expected 1")
    // the pre-overwrite version still reads the old rows (snapshot
    // isolation: overwrite never deletes files, vacuum does)
    assert(spark.sql(
      s"SELECT count(*) FROM $cname.graft.ow VERSION AS OF $vBefore")
      .head().getLong(0) == 3L)
  }

  test("TRUNCATE TABLE empties live state; history stays readable") {
    val (cname, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cname.graft.tr (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $cname.graft.tr VALUES (1, 10), (2, 20)")
    val vFull = spark.sql(s"SELECT max(version) FROM $cname.graft.`tr$$history`")
      .head().getLong(0)
    spark.sql(s"TRUNCATE TABLE $cname.graft.tr")
    assert(spark.sql(s"SELECT count(*) FROM $cname.graft.tr")
      .head().getLong(0) == 0L)
    // time travel to the pre-truncate version still serves the rows
    assert(spark.sql(
      s"SELECT count(*) FROM $cname.graft.tr VERSION AS OF $vFull")
      .head().getLong(0) == 2L)
    // a fresh INSERT lands on the empty table
    spark.sql(s"INSERT INTO $cname.graft.tr VALUES (5, 50)")
    assert(spark.sql(s"SELECT id, v FROM $cname.graft.tr").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((5L, 50L)))
  }

  test("torn truncate is atomic across the WAL: old state or new, never a middle") {
    val wh = Files.createTempDirectory("graft-torn").toString
    val cfg = TableConfig(memSliceSize = 4096, walEnabled = true)
    val t = GraftTable.create(spark, s"$wh/t",
      SchemaDsl.struct("id" -> "int64", "v" -> "int64"),
      Identity.Keys(Seq("id")), cfg)
    t.upsertAll(Seq(Row(1L, 10L), Row(2L, 20L), Row(3L, 30L)), startLsn = 1)
    t.flush(); t.publish()
    // committed-but-UNFLUSHED row: durable only in the WAL, and at a
    // caller LSN far above the commit watermark — the resurrection bait
    t.upsertAll(Seq(Row(99L, 990L)), startLsn = 100)

    final class OpFault(op: String, substr: String)
        extends graft.format.FioFaults {
      @volatile var armed = false
      override def beforeOp(o: String, path: String): Unit =
        if (armed && o == op && path.contains(substr))
          throw new java.io.IOException(s"injected fault: $o $path")
    }

    // crash BEFORE the manifest commit: the truncate must not be
    // observable at all — reopen recovers the full pre-truncate state
    // INCLUDING the WAL-only row
    val f1 = new OpFault("commit-rename", "manifest")
    graft.format.Fio.installFaults(wh, f1)
    try {
      f1.armed = true
      intercept[Exception] { t.truncate() }
      f1.armed = false
      val t2 = GraftTable.open(spark, s"$wh/t", Identity.Keys(Seq("id")), cfg)
      assert(t2.read(scala.None).count() == 4,
        "torn truncate lost the WAL-durable row")
      // crash AFTER the manifest commit, BEFORE the WAL delete: the
      // truncate is durable and the stale WAL must NOT resurrect rows
      val f2 = new OpFault("delete", "wal")
      graft.format.Fio.installFaults(wh, f2)
      f2.armed = true
      intercept[Exception] { t2.truncate() }
      f2.armed = false
      val t3 = GraftTable.open(spark, s"$wh/t", Identity.Keys(Seq("id")), cfg)
      assert(t3.read(scala.None).count() == 0,
        "stale WAL resurrected rows after a committed truncate")
    } finally graft.format.Fio.clearFaults()
  }

  test("TRUNCATE works on keyed tables and clears their index") {
    val (cname, wh) = freshCatalog()
    val cat = GraftCatalog(spark, wh)
    val t = cat.createTable("ktr",
      SchemaDsl.struct("id" -> "int64", "v" -> "int64"),
      Identity.Keys(Seq("id")))
    t.upsertAll((1L to 20L).map(i => Row(i, i)), startLsn = 1)
    t.flush(); t.publish()
    spark.sql(s"TRUNCATE TABLE $cname.graft.ktr")
    assert(spark.sql(s"SELECT count(*) FROM $cname.graft.ktr")
      .head().getLong(0) == 0L)
    // post-truncate upserts start clean: no stale index hit resurrects
    // or deletes against dropped state
    val t2 = {
      val entry = new MetadataStore(wh).allEntries().find(_.table == "ktr").get
      GraftTable.open(spark, s"$wh/ktr", entry.identity, entry.config)
    }
    t2.upsertAll(Seq(Row(1L, 100L)), startLsn = 1000)
    t2.flush(); t2.publish()
    assert(spark.sql(s"SELECT v FROM $cname.graft.ktr WHERE id = 1")
      .head().getLong(0) == 100L)
  }
}

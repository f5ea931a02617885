package graft

import graft.model._
import graft.table._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The lakehouse maintenance verbs layered over the manifest log:
 *  RESTORE (rollback-as-commit), DELETE WHERE, column rename, type
 *  widening, and the files/history metadata tables. */
class TableVerbsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-verbs-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmpDir(): String =
    Files.createTempDirectory("graft-verbs").toString

  private val schema = SchemaDsl.struct(
    "id" -> "int32", "name" -> "string", "age" -> "int32")

  private def mkTable(cfg: TableConfig = TableConfig(walEnabled = false),
      dir: String = tmpDir() + "/t"): GraftTable =
    GraftTable.create(spark, dir, schema, Identity.Keys(Seq("id")), cfg)

  private def stateOf(t: GraftTable): Map[Int, (String, Int)] =
    t.read().collect().map(r => r.getInt(0) -> (r.getString(1), r.getInt(2))).toMap

  // ---- DELETE WHERE ----------------------------------------------------

  test("deleteWhere removes matching flushed and tail rows without rewrites") {
    val t = mkTable(TableConfig(memSliceSize = 2, walEnabled = false))
    t.insertAll((1 to 6).map(i => Row(i, s"u$i", 20 + i)), 1) // flushed
    val filesBefore = t.currentManifest.dataFiles.map(_.path).toSet
    val lsn = t.deleteWhere(col("age") >= 24) // ids 4,5,6
    assert(stateOf(t).keySet == Set(1, 2, 3))
    assert(lsn > 6)
    // untouched rows were not rewritten: the original files survive and
    // the matched rows became DV positions
    val m = t.currentManifest
    assert(filesBefore.subsetOf(m.dataFiles.map(_.path).toSet))
    assert(m.dataFiles.map(_.deletes).sum == 3)
    t.drop()
  }

  test("deleteWhere matching nothing is a no-op commit") {
    val t = mkTable()
    t.insertAll(Seq(Row(1, "a", 20)), 1)
    t.deleteWhere(col("age") > 99)
    assert(stateOf(t) == Map(1 -> ("a", 20)))
    t.drop()
  }

  // ---- UPDATE WHERE ----------------------------------------------------

  test("updateWhere rewrites matched rows via the upsert path") {
    val t = mkTable(TableConfig(memSliceSize = 2, walEnabled = false))
    t.insertAll((1 to 4).map(i => Row(i, s"u$i", 20 + i)), 1) // flushed
    t.updateWhere(col("age") >= 23,
      Map("name" -> concat(col("name"), lit("!")), "age" -> (col("age") + 100)))
    assert(stateOf(t) == Map(1 -> ("u1", 21), 2 -> ("u2", 22),
      3 -> ("u3!", 123), 4 -> ("u4!", 124)))
    // old row versions are DV'd, not rewritten in place
    assert(t.currentManifest.dataFiles.map(_.deletes).sum == 2)
    t.drop()
  }

  test("updateWhere rejects key-column assignments") {
    val t = mkTable()
    t.insertAll(Seq(Row(1, "a", 20)), 1)
    assertThrows[IllegalArgumentException](
      t.updateWhere(col("age") > 0, Map("id" -> lit(9))))
    t.drop()
  }

  // ---- RESTORE ---------------------------------------------------------

  test("restore is an auditable commit: history keeps the undone suffix") {
    val t = mkTable(TableConfig(memSliceSize = 2, walEnabled = false))
    t.insertAll(Seq(Row(1, "a", 20), Row(2, "b", 30)), 1)
    val vKeep = t.version
    val stateKeep = stateOf(t)
    t.upsertAll(Seq(Row(1, "a2", 21), Row(3, "c", 40)), 10)
    val vDirty = t.version
    val vNew = t.restoreToVersion(vKeep)
    assert(vNew > vDirty)
    assert(stateOf(t) == stateKeep)
    // the undone era is still readable by version (nothing rewritten)
    assert(t.readAsOfVersion(vDirty).count() == 3)
    // and ingest continues on top of the restored state
    t.upsertAll(Seq(Row(4, "d", 50)), 30)
    assert(stateOf(t) == stateKeep + (4 -> ("d", 50)))
    t.drop()
  }

  test("restore clears the WAL so rolled-back events never replay") {
    val dir = tmpDir() + "/t"
    val t = mkTable(TableConfig(memSliceSize = 2, walEnabled = true), dir)
    t.insertAll(Seq(Row(1, "a", 20), Row(2, "b", 30)), 1)
    t.flush()
    val vKeep = t.version
    t.upsertAll(Seq(Row(3, "c", 40)), 10) // sits in WAL + tail
    t.flush()
    t.restoreToVersion(vKeep)
    val re = GraftTable.open(spark, dir, Identity.Keys(Seq("id")),
      TableConfig(memSliceSize = 2, walEnabled = true))
    assert(stateOf(re) == Map(1 -> ("a", 20), 2 -> ("b", 30)))
    re.drop()
  }

  test("restore refuses unflushed state and unknown versions") {
    val t = mkTable()
    t.insertAll(Seq(Row(1, "a", 20)), 1)
    val v = t.version
    t.apply(Seq(Append(Row(2, "b", 30), 5), Commit(6))) // tail row
    assertThrows[IllegalArgumentException](t.restoreToVersion(v))
    t.flush()
    assertThrows[IllegalArgumentException](t.restoreToVersion(v + 999))
    t.drop()
  }

  // ---- RENAME ----------------------------------------------------------

  test("rename keeps stored values, re-add of the old name yields nulls") {
    val t = mkTable(TableConfig(memSliceSize = 2, walEnabled = false))
    t.insertAll(Seq(Row(1, "a", 20), Row(2, "b", 30)), 1) // flushed files
    t.alterRenameColumn("name", "full_name")
    assert(t.schema.fieldNames.toSeq == Seq("id", "full_name", "age"))
    val got = t.read().collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got == Map(1 -> "a", 2 -> "b")) // old files resolve via physical name
    // ingest under the NEW logical name
    t.upsertAll(Seq(Row(3, "c", 40)), 10)
    t.flush()
    assert(t.read().where(col("full_name") === "c").count() == 1)
    // re-adding the OLD name must NOT resurrect stored values
    t.alterAddColumn("name", "string")
    val names = t.read().select("name").collect().map(_.isNullAt(0))
    assert(names.length == 3 && names.forall(identity))
    t.drop()
  }

  test("rename survives reopen and rejects key columns") {
    val dir = tmpDir() + "/t"
    val t = mkTable(TableConfig(walEnabled = false), dir)
    t.insertAll(Seq(Row(1, "a", 20)), 1)
    t.flush()
    assertThrows[IllegalArgumentException](t.alterRenameColumn("id", "id2"))
    t.alterRenameColumn("age", "years")
    val re = GraftTable.open(spark, dir, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    assert(re.schema.fieldNames.toSeq == Seq("id", "name", "years"))
    assert(re.read().select("years").head().getInt(0) == 20)
    re.drop()
  }

  // ---- WIDEN -----------------------------------------------------------

  test("widen int32->int64: old INT32 files read wide, new rows exceed int range") {
    val t = mkTable(TableConfig(memSliceSize = 2, walEnabled = false))
    t.insertAll(Seq(Row(1, "a", 20), Row(2, "b", 30)), 1) // INT32 parquet
    t.alterWidenColumn("age", "int64")
    assert(t.schema("age").dataType == org.apache.spark.sql.types.LongType)
    // the pre-alter files are decoded under the wide read schema
    val wide = t.read().collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(wide == Map(1 -> 20L, 2 -> 30L))
    // and values beyond Int.MaxValue ingest + flush + read back
    val big = 3000000000L
    t.upsertAll(Seq(Row(3, "c", big)), 10)
    t.flush()
    assert(t.read().where(col("id") === 3).head().getLong(2) == big)
    t.drop()
  }

  test("widen propagates to buffered tail rows and survives reopen") {
    val dir = tmpDir() + "/t"
    val t = mkTable(TableConfig(walEnabled = true), dir)
    t.apply(Seq(Append(Row(1, "a", 20), 1), Commit(2))) // tail row (Int)
    t.alterWidenColumn("age", "int64")
    t.apply(Seq(Append(Row(2, "b", 4000000000L), 5), Commit(6)))
    t.flush()
    val re = GraftTable.open(spark, dir, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = true))
    val got = re.read().collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == Map(1 -> 20L, 2 -> 4000000000L))
    re.drop()
  }

  test("widen rejects key columns and narrowing") {
    val t = mkTable()
    assertThrows[IllegalArgumentException](t.alterWidenColumn("id", "int64"))
    assertThrows[IllegalArgumentException](t.alterWidenColumn("name", "int64"))
    t.drop()
  }

  // ---- metadata tables -------------------------------------------------

  test("metaFiles and metaHistory account rows exactly across versions") {
    val t = mkTable(TableConfig(memSliceSize = 2, walEnabled = false))
    t.insertAll((1 to 4).map(i => Row(i, s"u$i", 20 + i)), 1)
    t.apply(Seq(Delete(Seq(2), 10), Commit(11)))
    t.flush()
    // files: per-file live accounting sums to the readable state
    val mf = t.metaFiles.agg(sum("live_rows")).head().getLong(0)
    assert(mf == t.read().count())
    // history: every committed version's live_rows matches a time-travel
    // read of that version
    t.metaHistory.where(col("commit_lsn") >= 0).collect().foreach { r =>
      val v = r.getLong(0)
      assert(r.getLong(5) == t.readAsOfVersion(v).count(),
        s"live_rows mismatch at version $v")
    }
    t.drop()
  }
}

package graft

import graft.model._
import graft.table._
import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.nio.file.Files

/**
 * A NON-`file:` Hadoop filesystem scheme backing a full table
 * lifecycle — the S17/S4 accessor seam check the environment cannot
 * run against real S3/GCS (reference `storage/filesystem/accessor/
 * s3.rs`, `gcs.rs`): every engine IO goes through `Fio`/Hadoop
 * `FileSystem`, so a table rooted at `graftmock://...` must behave
 * identically to `file://...`. The mock registers through Hadoop's
 * ServiceLoader discovery exactly like the s3a/gs connectors do, and
 * any code path that assumed a local path or the default scheme would
 * fail here.
 */
class GraftMockFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: URI = URI.create("graftmock:///")
  override def getScheme: String = "graftmock"
}

class ObjectStoreSchemeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val schema = SchemaDsl.struct("id" -> "int64", "v" -> "int64")

  test("full table lifecycle on a non-file scheme (ingest/DV/reopen/SQL/iceberg)") {
    val local = Files.createTempDirectory("graft-objstore").toString
    val root = s"graftmock://$local/t"
    // the scheme resolves through ServiceLoader like s3a/gs would
    assert(graft.format.Fio.fs(root).getScheme == "graftmock")

    val t = GraftTable.create(spark, root, schema, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    t.upsertAll((1L to 50L).map(i => Row(i, i * 10L)), startLsn = 1)
    t.flush(); t.publish()
    // cross-batch delete resolves into a DV sidecar on the scheme
    t.apply(Seq(Delete(Seq(7L), 100L), Commit(101L)))
    t.flush(); t.publish()
    assert(t.read(scala.None).count() == 49L)

    // reopen from durable state on the scheme
    val t2 = GraftTable.open(spark, root, Identity.Keys(Seq("id")),
      TableConfig(walEnabled = false))
    assert(t2.read(scala.None).count() == 49L)
    assert(t2.read(scala.None).where("id = 8").head().getLong(1) == 80L)

    // DSv2 read path over the scheme
    val viaDsv2 = spark.read.format("graft").option("path", root).load()
    assert(viaDsv2.count() == 49L)
    assert(viaDsv2.where("id = 7").count() == 0L)

    // compaction + vacuum rewrite files on the scheme
    t2.optimize()
    assert(t2.vacuum() >= 0)
    assert(t2.read(scala.None).count() == 49L)

    // Iceberg snapshot sync + spec-parser reconstruction on the scheme
    val r = graft.format.iceberg.IcebergSync.sync(root, t2.currentManifest)
    val df = graft.format.iceberg.IcebergSync.readDataFrame(spark,
      r.metadataPath)
    assert(df.count() == 49L)
  }
}

package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.model._
import graft.table.{GraftTable, TableConfig}
import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/**
 * Replays the REFERENCE'S OWN recorded chaos-regression corpora
 * (`moonlink/src/table_handler/regression/issue_{1793,1834}_replay_
 * events.json` — event interleavings that exposed real bugs in the
 * reference, replayed by its `chaos_replay.rs` harness) against THIS
 * engine's table: appends/deletes (plain and staged-xact), aborts,
 * mid-xact flushes, snapshot publishes, compactions and index merges
 * land through the same public verbs the CDC pipeline uses, in the
 * exact recorded order. The corpus stays in the reference tree and is
 * read at test time (skipped when absent); the invariant is the
 * chaos-suite contract: the final table equals the clean fold, the
 * integrity check passes, and a crash-reopen reproduces the state.
 */
class ReplayRegressionSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-replay-regression")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val corpusDir =
    "/root/reference/src/moonlink/src/table_handler/regression"
  private val mapper = new ObjectMapper()

  /** corpus rows: (Int32 pk, ByteArray utf8, Int32) with
   *  row_identity = SinglePrimitiveKey(0) */
  private def rowOf(n: JsonNode): Row = {
    val vs = n.get("values").elements().asScala.toSeq
    def i32(x: JsonNode) = x.get("Int32").asInt()
    val bytes = vs(1).get("ByteArray").elements().asScala
      .map(_.asInt().toByte).toArray
    Row(i32(vs.head), new String(bytes, "UTF-8"), i32(vs(2)))
  }

  private def replay(name: String): Unit = {
    val file = new java.io.File(s"$corpusDir/${name}_replay_events.json")
    assume(file.exists(), s"reference corpus not present: $file")
    val events = java.nio.file.Files.readAllLines(file.toPath).asScala
      .filter(_.trim.nonEmpty).map(mapper.readTree(_)).toSeq
      .drop(1) // line 0 is the generator config
    val dir = java.nio.file.Files
      .createTempDirectory(s"replay-$name").toString + "/t"
    // mem_slice_size in the corpus config is u64::MAX: flushes happen
    // ONLY at the recorded FlushInitiation points, which is the point
    // of the interleaving
    val cfg = TableConfig(memSliceSize = Int.MaxValue)
    val t = GraftTable.create(spark, dir,
      SchemaDsl.struct("c0" -> "int32", "c1" -> "string", "c2" -> "int32"),
      Identity.Keys(Seq("c0")), cfg)
    // model fold: committed state only; per-xact pending ops
    val model = mutable.LinkedHashMap[Int, Row]()
    val pend = mutable.Map[Option[Long], mutable.ArrayBuffer[(Char, Row)]]()
    var lsn = 0L
    def next(): Long = { lsn += 1; lsn }
    def xidOf(v: JsonNode): Option[Long] = Option(v.get("xact_id"))
      .filterNot(_.isNull).map(_.asLong())
    var applied = 0
    events.foreach { e =>
      val kind = e.fieldNames().next()
      val v = e.get(kind)
      kind match {
        case "Append" =>
          val row = rowOf(v.get("row"))
          val xid = xidOf(v)
          t.apply(Seq(Append(row, next(), xid)))
          pend.getOrElseUpdate(xid, mutable.ArrayBuffer()) += (('a', row))
        case "Delete" =>
          val row = rowOf(v.get("row"))
          val xid = xidOf(v)
          // the generator uses delete_if_exists semantics (issue_1834
          // deletes keys that were never appended)
          t.apply(Seq(Delete(Seq(row.get(0)), next(), xid, ifExists = true)))
          pend.getOrElseUpdate(xid, mutable.ArrayBuffer()) += (('d', row))
        case "Abort" =>
          val xid = v.get("xact_id").asLong()
          t.apply(Seq(StreamAbort(xid)))
          pend.remove(Some(xid))
        case "Commit" =>
          val xid = xidOf(v)
          t.apply(Seq(Commit(next(), xid)))
          applied += 1
          pend.remove(xid).foreach(_.foreach {
            case ('a', row) => model(row.getInt(0)) = row
            case ('d', row) => model.remove(row.getInt(0))
          })
        case "FlushInitiation" => t.flush()
        case "MooncakeSnapshotInitiation" => t.publish()
        case "IcebergSnapshotInitiation" =>
          // the reference exports an iceberg snapshot here; ours rides
          // publish() — sync the real export on the same cadence
          graft.format.iceberg.IcebergSync.sync(t.root, t.currentManifest)
        case "DataCompactionInitiation" => t.optimize()
        case "IndexMergeInitiation" => t.mergeIndexes()
        case k if k.endsWith("Completion") => () // our verbs are synchronous
        case other => fail(s"unmapped replay event: $other")
      }
    }
    require(applied > 100, s"corpus $name applied only $applied txns")
    def stateOf(df: org.apache.spark.sql.DataFrame): Seq[(Int, String, Int)] =
      df.collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
        .toSeq.sortBy(_._1)
    val expected = model.values
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq.sortBy(_._1)
    assert(stateOf(t.read()) == expected,
      s"$name: final table diverged from the clean fold")
    val bad = t.integrityCheck().filterNot(_._2)
    assert(bad.isEmpty, s"$name integrity check failed: $bad")
    // crash-reopen: durable state alone must reproduce the fold
    val t2 = GraftTable.open(spark, dir, Identity.Keys(Seq("c0")), cfg)
    assert(stateOf(t2.read()) == expected,
      s"$name: reopened table diverged from the clean fold")
    t2.drop()
  }

  test("reference regression corpus issue_1793 replays clean " +
      "(staged xacts + aborts under flush/snapshot/merge interleaving)") {
    replay("issue_1793")
  }

  test("reference regression corpus issue_1834 replays clean " +
      "(delete-if-exists churn under compaction/iceberg interleaving)") {
    replay("issue_1834")
  }
}

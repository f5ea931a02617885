package graft

import graft.model._
import graft.table._
import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable
import scala.util.Random

/**
 * Chaos testing (the reference's randomized event-sequence harness,
 * `table_handler/chaos_test.rs:1-7`, re-expressed as a property test):
 * seeded random CDC streams — appends, deletes, upserts, commits,
 * streaming transactions with aborts, random flush/compact/reopen —
 * must always equal a naive in-memory model at every commit point.
 *
 * Invariants (as the reference declares them): begin/end pairing is
 * implicit in apply(); deletes target committed rows or tail rows; LSN
 * always increases; reads reflect exactly the committed prefix.
 */
class ChaosSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-chaos")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val schema = SchemaDsl.struct("k" -> "int64", "v" -> "int64")

  /** the oracle: plain map keyed like the table */
  private final class Model {
    val live = mutable.HashMap[Long, Long]()   // committed state
    val tailOps = mutable.ArrayBuffer[(String, Long, Long)]() // uncommitted
    def apply(op: (String, Long, Long)): Unit = tailOps += op
    def commit(): Unit = {
      tailOps.foreach {
        case ("a", k, v) => live(k) = v
        case ("d", k, _) => live.remove(k)
      }
      tailOps.clear()
    }
  }

  private def runChaos(seed: Long, steps: Int, cfg: TableConfig): Unit = {
    val rnd = new Random(seed)
    val dir = java.nio.file.Files.createTempDirectory(s"chaos-$seed").toString
    var table = GraftTable.create(spark, s"$dir/t", schema,
      Identity.Keys(Seq("k")), cfg)
    val model = new Model
    var lsn = 0L
    def nextLsn(): Long = { lsn += 1; lsn }

    val batch = mutable.ArrayBuffer[CdcEvent]()
    var checkpoints = 0
    (0 until steps).foreach { _ =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 => // upsert random key
          val k = rnd.nextInt(40).toLong
          val v = rnd.nextLong(1000000)
          val l = nextLsn()
          batch ++= CdcEvent.upsert(Row(k, v), Seq(k), l)
          model.apply(("d", k, 0L)); model.apply(("a", k, v))
        case 4 | 5 => // append fresh key
          val k = 1000L + rnd.nextInt(100000)
          val v = rnd.nextLong(1000000)
          batch += Append(Row(k, v), nextLsn())
          model.apply(("a", k, v))
        case 6 => // delete (maybe-existing) key
          val k = rnd.nextInt(40).toLong
          batch += Delete(Seq(k), nextLsn(), ifExists = true)
          model.apply(("d", k, 0L))
        case 7 => // commit + verify
          val l = nextLsn()
          batch += Commit(l)
          table.apply(batch.toSeq); batch.clear()
          model.commit()
          val got = table.read(Some(l)).collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(got == model.live.toMap,
            s"seed=$seed lsn=$l: table=${got.size} rows vs model=${model.live.size}")
          checkpoints += 1
        case 8 => // streaming transaction (commit or abort)
          val xid = rnd.nextLong(1 << 30)
          val n = 1 + rnd.nextInt(5)
          val xevs = mutable.ArrayBuffer[CdcEvent]()
          val xops = mutable.ArrayBuffer[(String, Long, Long)]()
          (0 until n).foreach { _ =>
            val k = rnd.nextInt(40).toLong
            val v = rnd.nextLong(1000000)
            xevs ++= CdcEvent.upsert(Row(k, v), Seq(k), nextLsn(), Some(xid))
            xops += (("d", k, 0L)); xops += (("a", k, v))
          }
          if (rnd.nextBoolean()) {
            xevs += Commit(nextLsn(), Some(xid))
            xops.foreach(model.apply)
            // xact commit also publishes whatever main-tail ops were
            // pending at that LSN boundary
            model.commit()
            // flush main batch alongside so LSN ordering is preserved
            table.apply(batch.toSeq ++ xevs.toSeq); batch.clear()
          } else {
            xevs += StreamAbort(xid)
            table.apply(batch.toSeq ++ xevs.toSeq); batch.clear()
            // aborted: model unchanged except main batch stays pending
          }
        case 9 => // maintenance / recovery / export chaos
          rnd.nextInt(4) match {
            case 0 => table.flush()
            case 1 => if (rnd.nextBoolean()) { table.compact(force = true); table.vacuum() }
            case 2 =>
              if (cfg.walEnabled && batch.isEmpty) {
                // simulated crash: reopen from disk
                table = GraftTable.open(spark, s"$dir/t",
                  Identity.Keys(Seq("k")), cfg)
              }
            case 3 =>
              // the Iceberg export verb interleaves with ingest at any
              // committed state; the spec parse-back must agree with
              // the manifest it exported (files AND DV cardinalities)
              val m = table.currentManifest
              val r = graft.format.iceberg.IcebergSync.sync(s"$dir/t", m)
              val st = graft.format.iceberg.IcebergSync.readState(r.metadataPath)
              assert(st.dataFiles.size == m.dataFiles.size,
                s"seed=$seed: iceberg export lost files")
              assert(st.dvs.values.map(_.getLongCardinality).sum ==
                m.dataFiles.map(_.deletes).sum,
                s"seed=$seed: iceberg export DV cardinality diverged")
          }
      }
    }
    // final commit + check
    batch += Commit(nextLsn())
    table.apply(batch.toSeq)
    model.commit()
    val got = table.read(None).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == model.live.toMap, s"seed=$seed final state diverged")
    assert(checkpoints > 0)
    table.drop()
  }

  // ---- injected IO faults (reference chaos_generator.rs +
  // filesystem_accessor_chaos_wrapper.rs re-expressed) ----------------

  /** Seeded fault injector: each mutating Fio op throws with
   *  probability `p` while armed. */
  private final class SeededFaults(seed: Long, p: Double)
      extends graft.format.FioFaults {
    private val rnd = new Random(seed)
    @volatile var armed = false
    override def beforeOp(op: String, path: String): Unit =
      if (armed && rnd.nextDouble() < p)
        throw new java.io.IOException(s"injected fault: $op $path")
  }

  private def isInjected(e: Throwable): Boolean = {
    var t: Throwable = e
    while (t != null) {
      if (t.isInstanceOf[java.io.IOException] && t.getMessage != null &&
          t.getMessage.startsWith("injected fault")) return true
      t = t.getCause
    }
    false
  }

  test("chaos: injected IO faults — reopen always recovers a committed prefix") {
    // Storage fails at random protocol points (tmp write, the window
    // between tmp write and rename-commit, file move, delete) during
    // ingest, flush, compact and vacuum. After every simulated crash the
    // table reopens from disk and its state must equal the op-log fold
    // at EXACTLY the recovered commit LSN — a batch is either wholly
    // durable (WAL landed) or wholly absent, never partial.
    Seq(11L, 2026L).foreach { seed =>
      val rnd = new Random(seed)
      val dir = java.nio.file.Files.createTempDirectory(s"chaos-io-$seed").toString
      val cfg = TableConfig(memSliceSize = 8, walEnabled = true,
        compactSmallFileRows = 16, compactDeleteRatio = 0.3)
      var table = GraftTable.create(spark, s"$dir/t", schema,
        Identity.Keys(Seq("k")), cfg)
      val faults = new SeededFaults(seed * 31, 0.10)
      graft.format.Fio.installFaults(dir, faults)
      try {
        // full op log: committed state at commit LSN L == fold of all
        // ops with lsn <= L in lsn order (stream has no aborted xacts)
        val oplog = mutable.ArrayBuffer[(Long, String, Long, Long)]()
        var lsn = 0L
        def nextLsn(): Long = { lsn += 1; lsn }
        def modelAt(cl: Long): Map[Long, Long] = {
          val m = mutable.HashMap[Long, Long]()
          oplog.iterator.takeWhile(_._1 <= cl).foreach {
            case (_, "a", k, v) => m(k) = v
            case (_, "d", k, _) => m.remove(k)
            case _ => ()
          }
          m.toMap
        }
        def verifyState(): Unit = {
          val cl = table.commitLsn
          val got = table.read(None).collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(got == modelAt(cl),
            s"seed=$seed: state at recovered commitLsn=$cl diverged " +
              s"(table=${got.size} rows, model=${modelAt(cl).size})")
        }
        def reopen(): Unit = {
          faults.armed = false // recovery itself runs fault-free
          table = GraftTable.open(spark, s"$dir/t", Identity.Keys(Seq("k")), cfg)
          verifyState()
          faults.armed = true
        }
        val batch = mutable.ArrayBuffer[CdcEvent]()
        val pending = mutable.ArrayBuffer[(Long, String, Long, Long)]()
        var crashes = 0
        faults.armed = true
        (0 until 180).foreach { _ =>
          rnd.nextInt(8) match {
            case 0 | 1 | 2 => // upsert
              val k = rnd.nextInt(30).toLong
              val v = rnd.nextLong(1000000)
              val l = nextLsn()
              batch ++= CdcEvent.upsert(Row(k, v), Seq(k), l)
              pending += ((l, "d", k, 0L)); pending += ((l, "a", k, v))
            case 3 => // append fresh key
              val k = 1000L + rnd.nextInt(100000)
              val v = rnd.nextLong(1000000)
              val l = nextLsn()
              batch += Append(Row(k, v), l)
              pending += ((l, "a", k, v))
            case 4 => // delete (maybe-existing) key
              val k = rnd.nextInt(30).toLong
              val l = nextLsn()
              batch += Delete(Seq(k), l, ifExists = true)
              pending += ((l, "d", k, 0L))
            case 5 | 6 => // commit attempt — the crash-interesting moment
              val cl = nextLsn()
              batch += Commit(cl)
              try {
                table.apply(batch.toSeq)
                oplog ++= pending
                pending.clear(); batch.clear()
              } catch {
                case e: Throwable if isInjected(e) =>
                  crashes += 1
                  faults.armed = false
                  table = GraftTable.open(spark, s"$dir/t",
                    Identity.Keys(Seq("k")), cfg)
                  // WAL durability decides: the whole batch recovered,
                  // or none of it — sync the op log to what actually
                  // committed, then the state must match exactly
                  if (table.commitLsn >= cl) oplog ++= pending
                  pending.clear(); batch.clear()
                  verifyState()
                  faults.armed = true
              }
            case 7 => // maintenance under fire
              try {
                rnd.nextInt(3) match {
                  case 0 => table.flush()
                  case 1 => table.compact(force = true); table.vacuum()
                  case 2 => reopen() // clean crash: nothing in flight
                }
              } catch {
                case e: Throwable if isInjected(e) =>
                  crashes += 1
                  reopen()
              }
          }
        }
        faults.armed = false
        // drain the tail fault-free and verify the final state
        batch += Commit(nextLsn())
        table.apply(batch.toSeq)
        oplog ++= pending
        verifyState()
        assert(crashes > 0, s"seed=$seed never hit an injected fault")
        table.drop()
      } finally graft.format.Fio.clearFaults()
    }
  }

  test("chaos: random CDC streams match the in-memory model (tiny mem slice)") {
    runChaos(seed = 42, steps = 120,
      TableConfig(memSliceSize = 8, walEnabled = false,
        compactSmallFileRows = 16, compactDeleteRatio = 0.3))
  }

  test("chaos: with WAL recovery reopens") {
    runChaos(seed = 7, steps = 100,
      TableConfig(memSliceSize = 8, walEnabled = true,
        compactSmallFileRows = 16, compactDeleteRatio = 0.3))
  }

  test("chaos: default-ish config, more steps") {
    runChaos(seed = 1234, steps = 200,
      TableConfig(memSliceSize = 64, walEnabled = false))
  }

  test("chaos: bucketed layout holds under injected faults and recovery") {
    // round-12's bucket-aware writes under fire: after optimize(bucketBy
    // = 4), every flush / WAL replay / escalated compaction must leave
    // files that are GENUINELY single-bucket (or none at all after a
    // crash — the manifest commit is atomic), state must stay op-log
    // exact, and correctness must never depend on the spec surviving.
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val seed = 97L
    val rnd = new Random(seed)
    val dir = java.nio.file.Files.createTempDirectory(s"chaos-bkt-$seed").toString
    val cfg = TableConfig(memSliceSize = 8, walEnabled = true,
      compactSmallFileRows = 16, compactDeleteRatio = 0.3)
    var table = GraftTable.create(spark, s"$dir/t", schema,
      Identity.Keys(Seq("k")), cfg)
    var lsn = 0L
    def nextLsn(): Long = { lsn += 1; lsn }
    val oplog = mutable.ArrayBuffer[(Long, String, Long, Long)]()
    def modelAt(cl: Long): Map[Long, Long] = {
      val m = mutable.HashMap[Long, Long]()
      oplog.iterator.takeWhile(_._1 <= cl).foreach {
        case (_, "a", k, v) => m(k) = v
        case (_, "d", k, _) => m.remove(k)
      }
      m.toMap
    }
    def verify(): Unit = {
      val got = table.read(None).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == modelAt(table.commitLsn), "state diverged")
      val m = table.currentManifest
      assert(m.bucketN == 0L || m.bucketN == 4L)
      m.dataFiles.filter(_.bucket >= 0L).foreach { e =>
        val bs = spark.read.parquet(s"$dir/t/data/${e.path}")
          .select(pmod(xxhash64(col("k")), lit(4L)).as("b"))
          .distinct().collect().map(_.getLong(0)).toSeq
        assert(bs.isEmpty || bs == Seq(e.bucket),
          s"file ${e.path} broke the bucket invariant: $bs != ${e.bucket}")
      }
    }
    // seed + bucket the layout fault-free
    (1 to 20).foreach { i =>
      val l = nextLsn()
      table.apply(CdcEvent.upsert(Row(i.toLong, i.toLong), Seq(i.toLong), l))
      oplog += ((l, "d", i.toLong, 0L)); oplog += ((l, "a", i.toLong, i.toLong))
    }
    val cl0 = nextLsn(); table.apply(Seq(Commit(cl0)))
    table.optimize(bucketBy = Some(4))
    verify()
    val faults = new SeededFaults(seed * 31, 0.10)
    graft.format.Fio.installFaults(dir, faults)
    try {
      val batch = mutable.ArrayBuffer[CdcEvent]()
      val pending = mutable.ArrayBuffer[(Long, String, Long, Long)]()
      var crashes = 0
      faults.armed = true
      def recover(cl: Long): Unit = {
        crashes += 1
        faults.armed = false
        table = GraftTable.open(spark, s"$dir/t", Identity.Keys(Seq("k")), cfg)
        if (cl >= 0 && table.commitLsn >= cl) oplog ++= pending
        pending.clear(); batch.clear()
        verify()
        faults.armed = true
      }
      (0 until 140).foreach { _ =>
        rnd.nextInt(8) match {
          case 0 | 1 | 2 =>
            val k = rnd.nextInt(30).toLong
            val v = rnd.nextLong(1000000)
            val l = nextLsn()
            batch ++= CdcEvent.upsert(Row(k, v), Seq(k), l)
            pending += ((l, "d", k, 0L)); pending += ((l, "a", k, v))
          case 3 =>
            val k = rnd.nextInt(30).toLong
            val l = nextLsn()
            batch += Delete(Seq(k), l, ifExists = true)
            pending += ((l, "d", k, 0L))
          case 4 | 5 =>
            val cl = nextLsn()
            batch += Commit(cl)
            try {
              table.apply(batch.toSeq)
              oplog ++= pending
              pending.clear(); batch.clear()
            } catch {
              case e: Throwable if isInjected(e) => recover(cl)
            }
          case 6 =>
            try table.flush()
            catch { case e: Throwable if isInjected(e) => recover(-1L) }
          case 7 =>
            // maintenance compaction now ESCALATES to a bucket-routed
            // rewrite on this table — the crash-interesting new path
            try { table.compact(force = true); table.vacuum() }
            catch { case e: Throwable if isInjected(e) => recover(-1L) }
        }
      }
      faults.armed = false
      batch += Commit(nextLsn())
      table.apply(batch.toSeq)
      oplog ++= pending
      verify()
      assert(crashes > 0, "never hit an injected fault")
      // the spec survives end-to-end; individual micro-flushes below
      // the per-bucket floor may legally sit unbucketed (both write
      // paths degrade scattered sub-floor batches to plain chunks)…
      val m = table.currentManifest
      assert(m.bucketN == 4L, "bucket spec lost without cause")
      // …and escalated compaction re-buckets that tail, restoring the
      // FULL layout — the recoverable invariant chaos must not break
      table.compact(force = true)
      val m2 = table.currentManifest
      assert(m2.bucketN == 4L, "bucket spec lost by escalated compaction")
      assert(m2.dataFiles.forall(_.bucket >= 0L),
        s"compaction left unbucketed files: ${m2.dataFiles.map(_.bucket)}")
      verify()
      table.drop()
    } finally graft.format.Fio.clearFaults()
  }
}

package graft

import graft.model._
import graft.operators.{IvfIndex, Similarity}
import graft.streaming.MaintenanceDaemon
import graft.table._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/**
 * Persisted-IVF-index maintenance under corpus delete churn (VERDICT
 * r16 #4). Probe-time safety never depends on this (the probe re-ranks
 * against the live corpus — the `ann_ivf_deleted` contract); what the
 * refresh repays is probe IO: index entries whose corpus ids died in
 * files past the compaction delete-ratio (`compaction_config.rs:48-55`)
 * are CDC-deleted from the assignment table on the maintenance tick.
 */
class IvfIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-ivfidx-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("maintenance tick repays index delete debt past the ratio; " +
      "unregistered indexes stay deliberately stale") {
    val s = spark
    import s.implicits._
    val cat = GraftCatalog(spark,
      Files.createTempDirectory("graft-ivfidx").toString)
    val vecs = (1L to 40L).map(i => (i,
      Seq((i % 4).toFloat, (i % 7).toFloat, (i % 11).toFloat, i.toFloat)))
      .toDF("id", "embedding")
    val corpus = cat.createTable("corpus",
      SchemaDsl.struct("id" -> "int64", "embedding" -> "array<float32>"),
      Identity.Keys(Seq("id")), TableConfig(walEnabled = false))
    // driver-path apply: ONE deterministic corpus file, so the per-file
    // delete ratios below are exact (the distributed path's size-tuned
    // coalesce may split small frames differently run to run)
    corpus.apply((1L to 40L).flatMap(i => CdcEvent.upsert(
      org.apache.spark.sql.Row(i,
        Seq((i % 4).toFloat, (i % 7).toFloat, (i % 11).toFloat,
          i.toFloat)), Seq(i), i)) :+ Commit(41L))
    corpus.flush(); corpus.publish()
    assert(corpus.currentManifest.dataFiles.size == 1)
    val cents = Similarity.ivfTrain(vecs, "id", "embedding", nCells = 4)
    val assigns = Similarity.ivfAssign(vecs, "id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toSeq.sortBy(_._1)
    def mkIndex(name: String): GraftTable = {
      val t = cat.createTable(name,
        SchemaDsl.struct("id" -> "int64", "cell" -> "int32"),
        Identity.Keys(Seq("id")), TableConfig(walEnabled = false))
      t.apply(assigns.flatMap { case (id, cell) => CdcEvent.upsert(
        org.apache.spark.sql.Row(id, cell), Seq(id), id) } :+ Commit(41L))
      t.flush(); t.publish()
      t
    }
    val idx = mkIndex("idx")
    val idx2 = mkIndex("idx_unregistered")
    val daemon = new MaintenanceDaemon(cat)
    daemon.registerAnnIndex("idx", "corpus")
    // BELOW the ratio (2/40 = 5%): the tick must not touch the index —
    // light delete debt waits for its threshold like any file debt
    corpus.deleteWhere(col("id") <= 2L)
    assert(!IvfIndex.refreshDue(corpus))
    daemon.maintenanceTick()
    assert(idx.currentManifest.liveRows == 40L,
      "a below-ratio corpus delete must not trigger an index refresh")
    // PAST the ratio (25/40 = 62.5% >= 0.5): the tick CDC-deletes the
    // dead assignment entries — and must do so BEFORE the corpus's own
    // compaction retires the DVs the refresh reads the dead ids from
    corpus.deleteWhere(col("id") <= 25L)
    assert(IvfIndex.refreshDue(corpus))
    val touched = daemon.maintenanceTick()
    assert(touched.contains("idx"), touched)
    assert(idx.currentManifest.liveRows == 15L,
      s"index live count must shrink to the surviving corpus ids, " +
        s"got ${idx.currentManifest.liveRows}")
    val liveIdxIds = idx.read().select("id").collect()
      .map(_.getLong(0)).toSet
    val liveCorpusIds = corpus.read().select("id").collect()
      .map(_.getLong(0)).toSet
    assert(liveIdxIds == liveCorpusIds,
      s"refreshed index ids must equal the live corpus ids")
    // the corpus's compaction ran in the SAME tick (62.5% >= ratio) and
    // repaid the file debt — proof the refresh read the masked ids
    // before the rewrite retired them
    assert(corpus.currentManifest.dataFiles.forall(_.deletes == 0L),
      "corpus compaction should have repaid the crossed file in-tick")
    // the probe over the refreshed index serves only live candidates
    val q = vecs.where(col("id") > 38L)
    val cand = Similarity.ivfCandidatesFromIndex(
      idx.read().select(col("id"), col("cell")), "id", cents,
      q, "id", "embedding", nProbe = 2)
    val candIds = cand.select("neighbor_id").distinct().collect()
      .map(_.getLong(0)).toSet
    assert(candIds.subsetOf(liveCorpusIds),
      s"dead candidates from a refreshed index: ${candIds -- liveCorpusIds}")
    // idempotence: nothing left to repay, nothing moves
    assert(IvfIndex.refresh(idx, corpus) == 0L)
    assert(idx.currentManifest.liveRows == 15L)
    // the UN-registered twin is untouched across every tick — stale by
    // design, probe-safe by re-ranking (the ann_ivf_deleted contract)
    assert(idx2.currentManifest.liveRows == 40L,
      "an unregistered index must stay stale")
  }

  test("refreshDue is driver arithmetic at catalog scale: 100k-file " +
      "manifest gates in milliseconds, no Spark job") {
    // VERDICT r17 #6: the maintenance tick pays refreshDue per
    // registered (index, corpus) pair per cycle — pin that gate's cost
    // like AggGateSpec pins aggregate planning, so a catalog with
    // thousands of registered pairs stays O(ms) per idle tick.
    import graft.format.{DataFileEntry, Manifest}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(StructField("id", LongType)))
    val files = (0 until 100000).map(i => DataFileEntry(
      f"f-$i%09d.parquet", 1000L, 64000L, i.toLong,
      deletes = if (i % 3 == 0) 10L else 0L)) // plenty of sub-ratio debt
    val m = Manifest(0L, 1L, 1L, schema.json, Seq("id"),
      files, Seq.empty, Seq.empty)
    val t0 = System.nanoTime()
    var due = false
    (0 until 100).foreach(_ => due |= IvfIndex.refreshDue(m, 0.2))
    val ms = (System.nanoTime() - t0) / 1e6
    assert(!due, "10/1000 masked is below the 0.2 ratio everywhere")
    // one crossed file flips it
    val hot = m.copy(dataFiles =
      files.updated(99999, files(99999).copy(deletes = 900L)))
    assert(IvfIndex.refreshDue(hot, 0.2))
    info(f"100 refreshDue gates over a 100k-file manifest: $ms%.1f ms")
    assert(ms < 5000.0, f"catalog-scale gate too slow: $ms%.1f ms / 100 calls")
  }
}

package graft.format

import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The incremental manifest log (VERDICT r17 #1): a commit writes
 *  O(changed-files) bytes, not O(all-files); every version replays to
 *  the exact manifest; expiry keeps retained versions materializable
 *  via the checkpoint sidecar; the CAS conflict contract is unchanged. */
class ManifestDeltaSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType)))

  private def tmpRoot(): String =
    Files.createTempDirectory("graft-mlog").toString + "/t"

  private def entry(i: Long, rows: Long = 100L): DataFileEntry =
    DataFileEntry(f"f-$i%09d.parquet", rows, rows * 64, i,
      stats = Map("id" -> Seq((i * 1000).toString, (i * 1000 + rows).toString)),
      nullStats = Map("id" -> "0", "v" -> "0"),
      sumStats = Map("v" -> (rows * 3).toString),
      valueStats = Map("v" -> Map("1" -> (rows / 2).toString,
        "2" -> (rows - rows / 2).toString)))

  private def base(n: Int): Manifest =
    Manifest(0L, 10L, 10L, schema.json, Seq("id"),
      (0 until n).map(i => entry(i.toLong)), Seq.empty, Seq.empty)

  private def docSize(root: String, v: Long): Long =
    Fio.sizeOf(f"$root/manifest/v$v%09d.json")

  test("single-file commit on a 100k-file table writes O(1) bytes, " +
      "latency flat in file count, replay exact") {
    val root = tmpRoot()
    val m0 = base(100000)
    ManifestLog.commit(root, m0) // v0: full (the one-time baseline)
    val fullBytes = docSize(root, 0L)

    // one appended file + one updated entry (a DV landing) + scalars —
    // the streaming micro-batch shape
    val m1 = m0.copy(version = 1L, commitLsn = 11L, flushLsn = 11L,
      dataFiles = m0.dataFiles.updated(7,
        m0.dataFiles(7).copy(deletes = 3L, dvAccounted = 3L)) :+
        entry(100000L))
    val t1 = System.nanoTime()
    ManifestLog.commit(root, m1, m0)
    val commit100k = (System.nanoTime() - t1) / 1e6
    val deltaBytes = docSize(root, 1L)
    assert(deltaBytes < fullBytes / 1000,
      s"delta must be O(changed files): $deltaBytes vs full $fullBytes")
    assert(deltaBytes < 16 * 1024, s"delta unexpectedly large: $deltaBytes")
    assert(ManifestLog.load(root, 1L) == m1, "replay must be exact")
    assert(ManifestLog.load(root, 0L) == m0, "history intact")

    // latency comparison: the same single-file commit on a 1-file table
    val root1 = tmpRoot()
    val s0 = base(1)
    ManifestLog.commit(root1, s0)
    val s1 = s0.copy(version = 1L, commitLsn = 11L,
      dataFiles = s0.dataFiles :+ entry(1L))
    val t2 = System.nanoTime()
    ManifestLog.commit(root1, s1, s0)
    val commit1 = (System.nanoTime() - t2) / 1e6
    info(f"commit latency: 1-file table $commit1%.2f ms, " +
      f"100k-file table $commit100k%.2f ms (full doc $fullBytes b, " +
      f"delta $deltaBytes b)")
    // the 100k commit pays an O(files) in-memory pointer diff but no
    // O(files) serialization/IO; generous bound so CI noise never flakes
    assert(commit100k < math.max(50.0, commit1 * 25),
      f"100k-file commit not flat: $commit100k%.1f ms vs $commit1%.1f ms")
  }

  test("a delta chain replays every version exactly; every Nth version " +
      "is a full checkpoint document; loadAll matches per-version load") {
    val root = tmpRoot()
    var prev = base(50)
    ManifestLog.commit(root, prev)
    val all = scala.collection.mutable.Buffer[(Long, Manifest)](0L -> prev)
    (1L to 20L).foreach { v =>
      // mixed mutation: drop one, update one, add one
      val files = prev.dataFiles.drop(1)
        .updated(3, prev.dataFiles(4).copy(deletes = v))
        .:+(entry(1000L + v))
      val m = prev.copy(version = v, commitLsn = 10L + v, dataFiles = files)
      ManifestLog.commit(root, m, prev)
      all += (v -> m)
      prev = m
    }
    all.foreach { case (v, m) =>
      assert(ManifestLog.load(root, v) == m, s"version $v replay mismatch") }
    assert(ManifestLog.foldVersions(root)((v, m) => (v, m)) == all.toSeq)
    // the interval checkpoint: v16 is a FULL document (parses as a
    // manifest with every file inline), v15/v17 are deltas
    val k = ManifestLog.checkpointInterval
    assert(Manifest.docFromJson(
      Fio.readString(f"$root/manifest/v$k%09d.json")).isLeft,
      s"v$k must be a full checkpoint document")
    assert(Manifest.docFromJson(
      Fio.readString(f"$root/manifest/v${k - 1}%09d.json")).isRight)
    assert(Manifest.docFromJson(
      Fio.readString(f"$root/manifest/v${k + 1}%09d.json")).isRight)
  }

  test("diff decompositions replay byte-exact for every unique-path " +
      "shape; ambiguous duplicates decline (full doc)") {
    def replayExact(from: Seq[DataFileEntry], to: Seq[DataFileEntry])
        : Unit = Manifest.diffFiles(from, to) match {
      case Some((rm, up, ad)) =>
        // replay through the real path: applyDelta over a wrapping base
        val baseM = Manifest(0L, 1L, 1L, schema.json, Seq("id"), from,
          Seq.empty, Seq.empty)
        val d = ManifestDelta(1, 1L, 0L, 2L, 2L, schema.json, Seq("id"),
          rm, up, ad, Seq.empty, Seq.empty, 0L, Seq.empty, 0L, Map.empty, 0L)
        assert(Manifest.applyDelta(baseM, d).dataFiles == to,
          s"replay not exact for rm=$rm up=${up.map(_.path)} " +
            s"ad=${ad.map(_.path)}")
      case scala.None => fail(s"unique-path shape must decompose: $from -> $to")
    }
    val b = base(5).dataFiles
    // the r18 diff declined reorders/re-adds; the greedy lock-step walk
    // decomposes them as remove+append, which replays exactly
    replayExact(b, b.reverse)
    replayExact(b, b.drop(1) :+ b.head)
    replayExact(b, b.drop(1).updated(0, b(1).copy(deletes = 9L)) :+ entry(99L))
    replayExact(b, Seq(entry(7L)) ++ b.take(2)) // prepend + truncate
    replayExact(b, Seq.empty)                   // drop everything
    replayExact(Seq.empty, b)                   // build from nothing
    // an AMBIGUOUS duplicate (same path, different content in base)
    // cannot replay exactly — the verification pass declines it
    val dup = b :+ b.head.copy(deletes = 5L)
    assert(Manifest.diffFiles(dup,
      dup.updated(0, b.head.copy(deletes = 1L))).isEmpty,
      "ambiguous duplicate-path update must decline to a full document")
    assert(Manifest.diffFiles(b :+ b.head, b).isEmpty,
      "duplicate-path base whose dup is dropped must decline " +
        "(set-removal would drop both copies)")
    // the streaming-commit shape still yields the minimal decomposition
    val Some((rm, up, ad)) = Manifest.diffFiles(b,
      b.drop(1).updated(0, b(1).copy(deletes = 9L)) :+ entry(99L))
    assert(rm == Seq(b.head.path) && up.map(_.path) == Seq(b(1).path) &&
      ad.map(_.path) == Seq(entry(99L).path))
  }

  test("foldVersions retains only the previous manifest: older versions " +
      "are garbage-collectable MID-fold (bounded driver heap)") {
    val root = tmpRoot()
    var prev = base(2000)
    ManifestLog.commit(root, prev)
    (1L to 24L).foreach { v =>
      val m = prev.copy(version = v, commitLsn = 10L + v,
        dataFiles = prev.dataFiles.drop(1) :+ entry(10000L + v))
      ManifestLog.commit(root, m, prev)
      prev = m
    }
    val refs = scala.collection.mutable.Buffer[
      java.lang.ref.WeakReference[Manifest]]()
    def collectedBeyondTail(tail: Int): Boolean = {
      // weak refs clear on full GC once strongly unreachable; retry a
      // few cycles before declaring retention
      var tries = 0
      while (tries < 10 &&
          refs.dropRight(tail).exists(_.get() != null)) {
        System.gc(); Thread.sleep(20); tries += 1
      }
      refs.dropRight(tail).forall(_.get() == null)
    }
    val lsns = ManifestLog.foldVersions(root) { (v, m) =>
      refs += new java.lang.ref.WeakReference(m)
      if (v == 12L)
        // mid-fold: everything older than the live (prev, current) pair
        // must already be collectable — the r18 materializing fold
        // provably fails this (its builder strongly holds every version)
        assert(collectedBeyondTail(2),
          "fold retained manifests older than the previous version")
      m.commitLsn
    }
    assert(lsns == (10L to 34L), "fold must still visit every version")
    assert(collectedBeyondTail(0),
      "fold result must not retain any manifest")
  }

  test("every non-dataFiles Manifest field has a ManifestDelta " +
      "counterpart (adding a field without extending the delta fails here)") {
    val mFields = classOf[Manifest].getDeclaredFields.map(_.getName)
      .filterNot(_.contains("$")).toSet - "dataFiles"
    val dFields = classOf[ManifestDelta].getDeclaredFields.map(_.getName)
      .filterNot(_.contains("$")).toSet --
      Set("graftDelta", "baseVersion", "removed", "updated", "added")
    assert(mFields == dFields,
      s"Manifest/ManifestDelta field mismatch: only-manifest=" +
        s"${mFields -- dFields}, only-delta=${dFields -- mFields} — " +
        "a field added to Manifest must be carried by ManifestDelta " +
        "(and applyDelta), or delta replay silently resets it")
  }

  test("a delta doc read by a full-manifest path fails legibly, " +
      "not with an opaque NPE") {
    val root = tmpRoot()
    val m0 = base(3)
    ManifestLog.commit(root, m0)
    val m1 = m0.copy(version = 1L, commitLsn = 11L,
      dataFiles = m0.dataFiles :+ entry(3L))
    ManifestLog.commit(root, m1, m0) // v1 is a delta document
    val e = intercept[IllegalArgumentException] {
      Manifest.fromJson(Fio.readString(f"$root/manifest/v${1L}%09d.json"))
    }
    assert(e.getMessage.contains("not a full manifest"), e.getMessage)
  }

  test("concurrent expiry between the sidecar sample and the chain walk: " +
      "a RETAINED delta version still loads (ADVICE r18 race)") {
    val root = tmpRoot()
    var prev = base(10)
    ManifestLog.commit(root, prev)
    val kept = scala.collection.mutable.Map[Long, Manifest](0L -> prev)
    (1L to 9L).foreach { v =>
      val m = prev.copy(version = v, commitLsn = 10L + v,
        dataFiles = prev.dataFiles :+ entry(100L + v))
      ManifestLog.commit(root, m, prev)
      kept(v) = m
      prev = m
    }
    // interleave the expiry EXACTLY in the race window: after load(6)
    // sampled !exists(sidecar), before it walks the chain — the probe
    // runs the same sequence expireVersions does (sidecar first, then
    // chain deletes), so the walk hits just-deleted base documents
    // scope to THIS suite's root: suites share one forked JVM, and an
    // unscoped probe could fire inside a neighbor suite's chain walk
    var fired = false
    ManifestLog.chainWalkProbe = (r: String, v: Long) =>
      if (!fired && r == root && v == 6L) {
        fired = true
        ManifestLog.checkpoint(r, 6L)
        (0L to 5L).foreach(x => ManifestLog.delete(r, x))
      }
    try {
      assert(ManifestLog.load(root, 6L) == kept(6L),
        "retained version must survive a concurrent expiry")
      assert(fired, "the race window was never exercised")
    } finally ManifestLog.chainWalkProbe = null
    // and WITHOUT the sidecar the same state still fails loudly
    assert(scala.util.Try(ManifestLog.load(root, 2L)).isFailure)
  }

  test("commitLsnOf streams only the document head: correct on both " +
      "shapes, aborts before the O(files) arrays") {
    val root = tmpRoot()
    val m0 = base(50000)
    ManifestLog.commit(root, m0)
    val m1 = m0.copy(version = 1L, commitLsn = 11L, flushLsn = 11L,
      dataFiles = m0.dataFiles :+ entry(50000L))
    ManifestLog.commit(root, m1, m0)
    assert(ManifestLog.commitLsnOf(root, 0L) == 10L, "full doc scalar")
    assert(ManifestLog.commitLsnOf(root, 1L) == 11L, "delta doc scalar")
    // early-abort proof: a counting stream over the ~14 MB full document
    // must surface only its head to the parser
    val path = f"$root/manifest/v${0L}%09d.json"
    val total = Fio.sizeOf(path)
    assert(total > 4L * 1024 * 1024, s"full doc unexpectedly small: $total")
    var bytesRead = 0L
    val in = new java.io.FilterInputStream(Fio.open(path)) {
      override def read(): Int = {
        val r = super.read(); if (r >= 0) bytesRead += 1; r }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        val r = super.read(b, off, len); if (r > 0) bytesRead += r; r }
    }
    try assert(Manifest.commitLsnOfStream(in) == 10L)
    finally in.close()
    assert(bytesRead <= 64L * 1024,
      s"streaming scalar read pulled $bytesRead of $total bytes — " +
        "the early abort is not engaging")
  }

  test("expiry on a delta floor: checkpoint sidecar keeps every " +
      "retained version loadable, expired versions fail loudly") {
    val root = tmpRoot()
    var prev = base(10)
    ManifestLog.commit(root, prev)
    val kept = scala.collection.mutable.Map[Long, Manifest](0L -> prev)
    (1L to 9L).foreach { v =>
      val m = prev.copy(version = v, commitLsn = 10L + v,
        dataFiles = prev.dataFiles :+ entry(100L + v))
      ManifestLog.commit(root, m, prev)
      kept(v) = m
      prev = m
    }
    // expire to the last 4: floor v6 is a delta document whose chain
    // (v0 full, v1..v5 deltas) is about to vanish
    ManifestLog.checkpoint(root, 6L)
    (0L to 5L).foreach(v => ManifestLog.delete(root, v))
    assert(ManifestLog.versions(root) == Seq(6L, 7L, 8L, 9L))
    (6L to 9L).foreach { v =>
      assert(ManifestLog.load(root, v) == kept(v),
        s"retained version $v must stay materializable") }
    assert(scala.util.Try(ManifestLog.load(root, 2L)).isFailure,
      "expired version must not load")
    // checkpoint is idempotent; delete removes the sidecar too
    ManifestLog.checkpoint(root, 6L)
    ManifestLog.delete(root, 6L)
    assert(Fio.list(s"$root/manifest")
      .forall(n => !n.contains("000000006")), "v6 docs fully removed")
  }

  test("CAS stays loud for a rival manifest, idempotent across " +
      "full-vs-delta encodings of the same manifest") {
    val root = tmpRoot()
    val m0 = base(3)
    ManifestLog.commit(root, m0)
    val m1 = m0.copy(version = 1L, commitLsn = 11L,
      dataFiles = m0.dataFiles :+ entry(3L))
    ManifestLog.commit(root, m1, m0) // delta claims v1
    // same manifest, full encoding: idempotent re-commit, no throw
    ManifestLog.commit(root, m1)
    ManifestLog.commit(root, m1, m0)
    // a DIFFERENT v1 is a conflict — both encodings
    val rival = m0.copy(version = 1L, commitLsn = 99L)
    intercept[java.util.ConcurrentModificationException] {
      ManifestLog.commit(root, rival)
    }
    intercept[java.util.ConcurrentModificationException] {
      ManifestLog.commit(root, rival, m0)
    }
    assert(ManifestLog.load(root, 1L) == m1)
  }
}

package graft

import graft.model._
import graft.storage.{CacheConfig, ObjectCache}
import graft.streaming.CdcPipeline
import graft.table._
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import scala.jdk.CollectionConverters._

/**
 * M16 object-storage cache: pin/unpin handles, LRU eviction under a
 * byte budget, tolerated insufficiency, delete markers, write-through
 * import — the state machine the reference pins in
 * `object_storage_cache.rs` + `state_tests.rs` — and the read-path
 * integration (scan pinning, fallback, identical results).
 */
class ObjectCacheSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-cache-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmpDir(): String =
    Files.createTempDirectory("graft-cache").toString

  /** A fake remote of `n` files, `bytes` each; counts fetches per id. */
  private class Remote(dir: String, n: Int, bytes: Int) {
    val fetched = scala.collection.mutable.Map[String, Int]()
    (0 until n).foreach { i =>
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/f$i.bin"),
        Array.fill[Byte](bytes)(i.toByte))
    }
    def fetcher: (String, String) => Unit = (remote, dest) => {
      val id = remote.split('/').last
      fetched.synchronized { fetched(id) = fetched.getOrElse(id, 0) + 1 }
      graft.format.Fio.copy(remote, dest)
    }
    def path(i: Int): String = s"$dir/f$i.bin"
  }

  test("hit serves without refetch; pinned entries survive pressure") {
    val rd = tmpDir(); val cd = tmpDir()
    val remote = new Remote(rd, 4, 100)
    val evicted = scala.collection.mutable.ArrayBuffer[String]()
    val cache = new ObjectCache(CacheConfig(250, cd), remote.fetcher,
      id => evicted += id)

    val h0 = cache.get("f0", remote.path(0)).get
    val h1 = cache.get("f1", remote.path(1)).get
    assert(cache.fetches == 2 && cache.currentBytes == 200)

    // both pinned: a third 100-byte file cannot fit -> tolerated miss
    assert(cache.get("f2", remote.path(2)).isEmpty)
    assert(cache.currentBytes == 200, "failed fetch must roll back bytes")

    // re-get of a pinned entry: no IO, refcount bump
    val h0b = cache.get("f0", remote.path(0)).get
    assert(remote.fetched("f0.bin") == 1 && cache.hits == 1)

    // unpin f1 -> evictable; now f2 fits by evicting LRU f1
    h1.unpin()
    val h2 = cache.get("f2", remote.path(2)).get
    assert(evicted.toSeq == Seq("f1") && cache.evictions == 1)
    assert(cache.currentBytes == 200)

    // f0 still pinned twice: budget can never evict it
    h0.unpin(); h0b.unpin(); h2.unpin()
  }

  test("LRU order is least-recently-unpinned first") {
    val rd = tmpDir(); val cd = tmpDir()
    val remote = new Remote(rd, 4, 100)
    val evicted = scala.collection.mutable.ArrayBuffer[String]()
    val cache = new ObjectCache(CacheConfig(300, cd), remote.fetcher,
      id => evicted += id)
    val h0 = cache.get("f0", remote.path(0)).get
    val h1 = cache.get("f1", remote.path(1)).get
    val h2 = cache.get("f2", remote.path(2)).get
    // release order: f1, f0, f2 -> LRU victim order must follow it
    h1.unpin(); h0.unpin(); h2.unpin()
    cache.get("f3", remote.path(3)).get.unpin()
    assert(evicted.toSeq == Seq("f1"))
    // touching f0 (hit-promote + unpin) moves it behind f2
    cache.get("f0", remote.path(0)).get.unpin()
    cache.get("f1", remote.path(1)).get.unpin() // refetch, evicts f2
    assert(evicted.toSeq == Seq("f1", "f2"))
    assert(remote.fetched("f1.bin") == 2, "evicted entry refetches")
  }

  test("delete marker defers physical delete to last unpin") {
    val rd = tmpDir(); val cd = tmpDir()
    val remote = new Remote(rd, 2, 100)
    val cache = new ObjectCache(CacheConfig(1000, cd), remote.fetcher)
    val h = cache.get("f0", remote.path(0)).get
    val local = h.localPath
    cache.delete("f0")
    assert(graft.format.Fio.exists(local), "pinned copy must survive drop")
    h.unpin()
    assert(!graft.format.Fio.exists(local), "last unpin performs the delete")
    assert(cache.currentBytes == 0)
    // a fresh get refetches cleanly after the drop
    val h2 = cache.get("f0", remote.path(0)).get
    assert(remote.fetched("f0.bin") == 2)
    h2.unpin()

    // evictable delete is immediate (f0's 100 evictable bytes remain)
    val h3 = cache.get("f1", remote.path(1)).get; h3.unpin()
    val p3 = h3.localPath
    cache.delete("f1")
    assert(!graft.format.Fio.exists(p3) && cache.currentBytes == 100)
  }

  test("importEntry adopts write-through pinned; insufficiency throws") {
    val rd = tmpDir(); val cd = tmpDir()
    val remote = new Remote(rd, 2, 100)
    val cache = new ObjectCache(CacheConfig(150, cd), remote.fetcher)
    val h = cache.importEntry("w0", remote.path(0))
    assert(cache.fetches == 0 && cache.currentBytes == 100)
    // 100 more bytes cannot fit while w0 is pinned
    assertThrows[IllegalStateException] {
      cache.importEntry("w1", remote.path(1))
    }
    h.unpin()
    cache.importEntry("w1", remote.path(1)) // evicts w0
    assert(cache.evictions == 1)
  }

  test("table scan through the cache: identical rows, pinned reads, fallback") {
    val schema = SchemaDsl.struct("id" -> "int64", "v" -> "string")
    val dir = tmpDir() + "/t"
    // tiny mem slice: commits flush to parquet, so the scan has real
    // data files to cache (and the delete resolves into a DV)
    val t = GraftTable.create(spark, dir, schema,
      Identity.Keys(Seq("id")), TableConfig(memSliceSize = 8, walEnabled = false))
    val rows = (1L to 50L).map(i => Row(i, s"v$i"))
    t.apply(rows.zipWithIndex.flatMap { case (r, i) =>
      CdcEvent.upsert(r, Seq(r.getLong(0)), i + 1L)
    } :+ Commit(51L))
    t.apply(Seq(Delete(Seq(7L), 60L), Commit(61L)))
    val plain = t.read(scala.None).orderBy("id").collect()

    val cd = tmpDir()
    var fetches = 0
    val cache = new ObjectCache(CacheConfig(1 << 30, cd),
      (r, d) => { fetches += 1; graft.format.Fio.copy(r, d) })
    t.attachCache(cache)
    val cached = t.read(scala.None).orderBy("id").collect()
    assert(cached.toSeq == plain.toSeq, "cache must not change results")
    assert(fetches > 0 && cache.pinnedCount == fetches)
    val f1 = fetches
    t.read(scala.None).orderBy("id").collect() // second read: all hits
    assert(fetches == f1, "warm scan must not refetch")
    assert(cache.pinnedCount == f1, "old pins release after re-pin")

    // zero-budget cache: every get denied -> falls back to remote paths
    val denied = new ObjectCache(CacheConfig(0, tmpDir()),
      (r, d) => graft.format.Fio.copy(r, d))
    t.attachCache(denied)
    val fb = t.read(scala.None).orderBy("id").collect()
    assert(fb.toSeq == plain.toSeq, "budget-denied scan reads remote")
    t.detachCache()
    assert(cache.pinnedCount == 0, "denied-read pin cycle released old pins")
    assert(denied.pinnedCount == 0)
    t.drop()
  }
}

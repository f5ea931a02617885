package graft.storage

import graft.format.Fio

import scala.collection.mutable

/** Byte budget + cache directory for an [[ObjectCache]]. */
final case class CacheConfig(maxBytes: Long, cacheDir: String)

/**
 * Pin handle for a cached file (reference `cache_handle.rs`
 * `NonEvictableHandle`): while held, the entry cannot be evicted.
 * `unpin()` releases the reference; the last release down-levels the
 * entry to the evictable LRU pool (or deletes it, if the entry was
 * dropped while pinned).
 */
final class CacheHandle private[storage] (
    val fileId: String, val localPath: String, cache: ObjectCache) {
  def unpin(): Unit = cache.unreference(this)
}

/**
 * Local-disk LRU cache of remote table files with pin/unpin handles —
 * M16, the Spark re-expression of the reference's NVMe object-storage
 * cache (`storage/cache/object_storage/object_storage_cache.rs`):
 *
 *  - entries are either NON-EVICTABLE (pinned, refcounted — a reader
 *    holds a handle) or EVICTABLE (unreferenced, LRU-ordered);
 *  - `get` pins: a pinned hit just bumps the refcount, an evictable hit
 *    promotes without IO, a miss fetches from the remote path through
 *    the injected accessor (Hadoop FS by default — file://, s3a://,
 *    hdfs://) and evicts LRU entries until the budget holds;
 *  - insufficiency is tolerated on reads (`None`, caller falls back to
 *    the remote path — the reference returns None the same way) and is
 *    an error on write-through `importEntry`;
 *  - dropping a pinned file leaves a delete marker (reference
 *    `evicted_entries`): the bytes disappear when the last pin
 *    releases, and the id is never served from the stale copy again.
 *
 * One instance serves one JVM. On a multi-executor cluster each
 * executor holds its own instance behind a lazy singleton (the same
 * per-JVM pattern `DvCache` uses for broadcast bitmaps); in local[n]
 * the driver instance IS the executor instance. All state transitions
 * are synchronized; fetch IO runs outside the lock.
 */
final class ObjectCache(
    config: CacheConfig,
    fetcher: (String, String) => Unit = ObjectCache.hadoopFetcher,
    onEvict: String => Unit = _ => ()) {

  private final class Entry(
      val fileId: String, val localPath: String, val bytes: Long,
      var refCount: Int)

  private val pinned = mutable.HashMap[String, Entry]()
  // LinkedHashMap in insertion order: entries re-enter on down-level,
  // so head == least-recently-unpinned == LRU victim
  private val evictable = mutable.LinkedHashMap[String, Entry]()
  private val deleteMarkers = mutable.HashSet[String]()
  private var curBytes = 0L
  private var gen = 0L
  // observability counters (the reference emits eviction-deletion
  // events through table_notify; specs assert on these)
  private var fetchesVar = 0L
  private var hitsVar = 0L
  private var evictionsVar = 0L

  def fetches: Long = synchronized(fetchesVar)
  def hits: Long = synchronized(hitsVar)
  def evictions: Long = synchronized(evictionsVar)
  def currentBytes: Long = synchronized(curBytes)
  def pinnedCount: Int = synchronized(pinned.size)
  def evictableCount: Int = synchronized(evictable.size)

  /** Pin `fileId`, fetching from `remotePath` on a miss. Returns None
   *  when the budget cannot hold the file even after evicting every
   *  unreferenced entry — the caller reads the remote path directly. */
  def get(fileId: String, remotePath: String): Option[CacheHandle] = {
    val (hit, dest) = synchronized {
      pinned.get(fileId) match {
        case Some(e) =>
          e.refCount += 1; hitsVar += 1
          (Some(new CacheHandle(fileId, e.localPath, this)), null)
        case scala.None =>
          evictable.remove(fileId) match {
            case Some(e) =>
              e.refCount = 1
              pinned(fileId) = e
              hitsVar += 1
              (Some(new CacheHandle(fileId, e.localPath, this)), null)
            case scala.None =>
              gen += 1
              // fresh subdir per fetch, basename preserved: positional
              // DV filtering keys on the parquet file NAME
              (scala.None,
                s"${config.cacheDir}/g$gen/${fileId.split('/').last}")
          }
      }
    }
    if (hit.isDefined) return hit
    fetcher(remotePath, dest) // IO outside the lock
    val bytes = Fio.sizeOf(dest)
    synchronized {
      fetchesVar += 1
      // a racing get may have fetched the same id; serve the winner
      pinned.get(fileId).orElse(evictable.remove(fileId)) match {
        case Some(e) =>
          Fio.delete(dest)
          e.refCount += 1
          pinned(fileId) = e
          Some(new CacheHandle(fileId, e.localPath, this))
        case scala.None =>
          if (!makeRoom(bytes)) {
            Fio.delete(dest)
            scala.None
          } else {
            curBytes += bytes
            pinned(fileId) = new Entry(fileId, dest, bytes, 1)
            Some(new CacheHandle(fileId, dest, this))
          }
      }
    }
  }

  /** Write-through adoption of a file already on local disk (reference
   *  `import_cache_entry`): pinned immediately; insufficiency is an
   *  error here, not a fallback. */
  def importEntry(fileId: String, localPath: String): CacheHandle = synchronized {
    require(!pinned.contains(fileId) && !evictable.contains(fileId),
      s"already cached: $fileId")
    val bytes = Fio.sizeOf(localPath)
    if (!makeRoom(bytes))
      throw new IllegalStateException(
        s"cache budget ${config.maxBytes} cannot hold import of $bytes bytes")
    curBytes += bytes
    pinned(fileId) = new Entry(fileId, localPath, bytes, 1)
    new CacheHandle(fileId, localPath, this)
  }

  /** Drop `fileId` from the cache. Evictable/absent: gone now. Pinned:
   *  a delete marker defers the physical delete to the last unpin. */
  def delete(fileId: String): Unit = synchronized {
    evictable.remove(fileId) match {
      case Some(e) =>
        curBytes -= e.bytes
        Fio.delete(e.localPath)
      case scala.None =>
        if (pinned.contains(fileId)) deleteMarkers += fileId
    }
  }

  private[storage] def unreference(h: CacheHandle): Unit = synchronized {
    val e = pinned.getOrElse(h.fileId,
      throw new IllegalStateException(s"unpin of unpinned ${h.fileId}"))
    e.refCount -= 1
    if (e.refCount == 0) {
      pinned.remove(h.fileId)
      if (deleteMarkers.remove(h.fileId)) {
        curBytes -= e.bytes
        Fio.delete(e.localPath)
      } else {
        evictable(h.fileId) = e // tail of LRU order
      }
    }
  }

  /** Evict LRU evictable entries until `extra` more bytes fit. Must be
   *  called under the lock. Returns false (nothing changed beyond the
   *  evictions already performed) when pinned entries alone exceed the
   *  budget — the tolerated-insufficiency read path. */
  private def makeRoom(extra: Long): Boolean = {
    while (curBytes + extra > config.maxBytes && evictable.nonEmpty) {
      val (id, e) = evictable.head
      evictable.remove(id)
      curBytes -= e.bytes
      evictionsVar += 1
      Fio.delete(e.localPath)
      onEvict(id)
    }
    curBytes + extra <= config.maxBytes
  }
}

object ObjectCache {
  /** Default remote accessor: Hadoop-FS copy — the same seam the table
   *  uses for all IO, so file://, hdfs:// and s3a:// all work. */
  def hadoopFetcher: (String, String) => Unit = (remote, dest) =>
    Fio.copy(remote, dest)
}

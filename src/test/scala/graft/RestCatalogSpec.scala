package graft

import graft.format.RestCatalog
import org.scalatest.funsuite.AnyFunSuite

/**
 * Iceberg-REST-catalog-protocol pointer store (reference
 * `storage/table/iceberg/rest_catalog.rs:96-186`): namespace/table
 * CRUD over real HTTP, `assert-create` and `assert-ref-snapshot-id`
 * requirements, and the 409-conflict optimistic-commit contract.
 */
class RestCatalogSpec extends AnyFunSuite {

  test("namespace + table lifecycle, load round-trip") {
    val srv = new RestCatalog.Server().start()
    try {
      val c = new RestCatalog.Client(srv.baseUrl)
      assert(c.config() != null)
      c.createNamespace("wh")
      assert(c.listNamespaces() == Seq("wh"))
      assert(!c.tableExists("wh", "t1"))
      c.createTable("wh", "t1", "/data/t1/manifest/v000000001.json", 1L)
      assert(c.tableExists("wh", "t1"))
      val ref = c.loadTable("wh", "t1")
      assert(ref.metadataLocation.endsWith("v000000001.json") &&
        ref.snapshotId == 1L)
      c.dropTable("wh", "t1")
      assert(!c.tableExists("wh", "t1"))
    } finally srv.stop()
  }

  test("assert-create rejects double registration") {
    val srv = new RestCatalog.Server().start()
    try {
      val c = new RestCatalog.Client(srv.baseUrl)
      c.createNamespace("wh")
      c.createTable("wh", "t", "/m/v1.json", 1L)
      intercept[IllegalArgumentException] {
        c.createTable("wh", "t", "/m/v1.json", 1L)
      }
    } finally srv.stop()
  }

  test("optimistic commit: stale snapshot 409s, reload-retry lands") {
    val srv = new RestCatalog.Server().start()
    try {
      val c = new RestCatalog.Client(srv.baseUrl)
      c.createNamespace("wh")
      c.createTable("wh", "t", "/m/v1.json", 1L)
      // writer A commits v2
      assert(c.commitTable("wh", "t", expectedSnapshotId = 1L,
        "/m/v2.json", 2L))
      // writer B still thinks v1 is current -> conflict
      assert(!c.commitTable("wh", "t", expectedSnapshotId = 1L,
        "/m/v2b.json", 3L))
      // B reloads, rebases, retries -> lands
      val cur = c.loadTable("wh", "t")
      assert(cur.snapshotId == 2L)
      assert(c.commitTable("wh", "t", cur.snapshotId, "/m/v3.json", 3L))
      assert(c.loadTable("wh", "t").metadataLocation == "/m/v3.json")
    } finally srv.stop()
  }

  test("concurrent commits: exactly one of N racers wins each round") {
    val srv = new RestCatalog.Server().start()
    try {
      val c = new RestCatalog.Client(srv.baseUrl)
      c.createNamespace("wh")
      c.createTable("wh", "t", "/m/v0.json", 0L)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (1 to 8).map { i =>
        new Thread(() => {
          val me = new RestCatalog.Client(srv.baseUrl)
          if (me.commitTable("wh", "t", 0L, s"/m/v$i.json", i.toLong))
            wins.incrementAndGet()
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(15000))
      assert(wins.get() == 1, s"${wins.get()} racers won a CAS round")
    } finally srv.stop()
  }
}

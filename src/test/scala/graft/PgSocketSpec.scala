package graft

import graft.sources.{PgMockServer, PgReplicationClient, PgWire}
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/**
 * Streaming-replication socket transport (reference
 * `pg_replicate/postgres_source.rs:311`): v3 startup with
 * `replication=database`, START_REPLICATION over simple query,
 * copy-both XLogData framing, keepalive -> standby-status acks,
 * clean CopyDone shutdown — against a real loopback TCP listener.
 */
class PgSocketSpec extends AnyFunSuite {

  private def frame(n: Int): Array[Byte] =
    Array.tabulate[Byte](5 + (n % 7))(i => ((n * 31 + i) & 0x7f).toByte)

  test("frames arrive intact, in order, over a real socket") {
    val frames = (0 until 25).map(frame)
    val server = new PgMockServer(frames, keepaliveEvery = 8).start()
    val got = mutable.ArrayBuffer[Array[Byte]]()
    val client = new PgReplicationClient("127.0.0.1", server.port,
      "u", "db", "slot1", "pub1")
    client.stream(b => got += b)
    server.join()
    assert(server.error.isEmpty, server.error)
    assert(got.length == frames.length)
    got.zip(frames).foreach { case (a, b) => assert(a.sameElements(b)) }
    assert(server.sawReplicationParam, "replication=database must be declared")
    assert(server.sawStartReplication)
  }

  test("every reply-requested keepalive is acked with advancing LSNs") {
    val frames = (0 until 10).map(frame)
    val server = new PgMockServer(frames, keepaliveEvery = 2).start()
    val client = new PgReplicationClient("127.0.0.1", server.port,
      "u", "db", "slot1", "pub1")
    client.stream(_ => ())
    server.join()
    assert(server.error.isEmpty, server.error)
    // 10 frames, keepalive every 2 (skipping i=0) -> 4 mid-stream + 1 final
    assert(server.statusUpdates.length == 5)
    val flushes = server.statusUpdates.map(_._2)
    assert(flushes == flushes.sorted, "acked LSNs must be monotone")
    assert(client.flushedLsn >= flushes.last)
  }

  test("wire helpers: i64 round-trip and copy payload layout") {
    for (v <- Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 946684800000000L)) {
      val o = new java.io.ByteArrayOutputStream()
      PgWire.putI64(o, v)
      assert(PgWire.i64(o.toByteArray, 0) == v, s"v=$v")
    }
    val x = PgWire.xlogData(1000L, Array[Byte](1, 2, 3))
    assert(x(0) == 'w' && PgWire.i64(x, 1) == 1000L &&
      PgWire.i64(x, 9) == 1003L && x.length == 28)
    val k = PgWire.keepalive(5L, replyRequested = true)
    assert(k(0) == 'k' && PgWire.i64(k, 1) == 5L && k(17) == 1)
  }
}

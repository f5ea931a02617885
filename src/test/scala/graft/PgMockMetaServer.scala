package graft

import graft.sources.PgWire

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

/**
 * Scripted postgres "registry" primary for [[graft.table.PgWireMetadataBackend]]:
 * a real TCP listener speaking the v3 simple-query protocol, holding
 * the `tables` registry in memory across connections (state survives
 * the backend's one-connection-per-op discipline). Duplicate inserts
 * answer with a genuine ErrorResponse carrying SQLSTATE 23505, like a
 * real primary's unique-violation.
 */
final class PgMockMetaServer {
  private val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
  // (database, table) -> the 5 stored column values, insertion-ordered
  private val entries =
    mutable.LinkedHashMap[(String, String), Seq[String]]()
  @volatile private var created = false
  @volatile var error: Option[Throwable] = scala.None
  @volatile private var stopped = false

  def port: Int = server.getLocalPort

  private val thread = new Thread(() => {
    try {
      while (!stopped) {
        val sock = server.accept()
        try handle(sock)
        catch { case t: Throwable => if (error.isEmpty) error = Some(t) }
        finally sock.close()
      }
    } catch { case _: java.net.SocketException if stopped => () }
  }, "pg-mock-meta")

  def start(): PgMockMetaServer = {
    thread.setDaemon(true); thread.start(); this
  }

  def stop(): Unit = { stopped = true; server.close() }

  /** The single-quoted literals of a statement, in order, '' unescaped. */
  private def literals(sql: String): Seq[String] = {
    val out = mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (!inQ) { if (c == '\'') { inQ = true; cur.clear() } }
      else if (c == '\'') {
        if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
          cur += '\''; i += 1
        } else { inQ = false; out += cur.toString }
      } else cur += c
      i += 1
    }
    out.toSeq
  }

  private def rowDescription(names: Seq[String]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    val d = new DataOutputStream(o)
    d.writeShort(names.size)
    names.foreach { n =>
      d.write(n.getBytes(UTF_8)); d.write(0)
      d.writeInt(0); d.writeShort(0)
      d.writeInt(25); d.writeShort(-1); d.writeInt(-1)
      d.writeShort(0)
    }
    o.toByteArray
  }

  private def dataRow(vals: Seq[String]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    val d = new DataOutputStream(o)
    d.writeShort(vals.size)
    vals.foreach { s =>
      if (s == null) d.writeInt(-1)
      else { val b = s.getBytes(UTF_8); d.writeInt(b.length); d.write(b) }
    }
    o.toByteArray
  }

  private def handle(sock: Socket): Unit = {
    sock.setTcpNoDelay(true)
    val in = new DataInputStream(sock.getInputStream)
    val out = new PgWire.MsgOut(new DataOutputStream(sock.getOutputStream))
    val len = in.readInt()
    val body = new Array[Byte](len - 4)
    in.readFully(body)
    out.send('R', Array[Byte](0, 0, 0, 0))
    out.send('Z', Array[Byte]('I'.toByte))
    def complete(tag: String): Unit =
      out.send('C', tag.getBytes(UTF_8) :+ 0.toByte)
    def ready(): Unit = out.send('Z', Array[Byte]('I'.toByte))
    var open = true
    while (open) PgWire.readMessage(in) match {
      case Some(('Q', qb)) =>
        val sql = new String(qb, UTF_8).trim.stripSuffix(";").trim
        val low = sql.toLowerCase
        entries.synchronized {
          if (low.startsWith("select 1 from pg_tables")) {
            out.send('T', rowDescription(Seq("?column?")))
            if (created) out.send('D', dataRow(Seq("1")))
            complete(s"SELECT ${if (created) 1 else 0}"); ready()
          } else if (low.startsWith("create table if not exists tables")) {
            created = true
            complete("CREATE TABLE"); ready()
          } else if (low.startsWith("insert into tables")) {
            val vals = literals(sql)
            require(vals.size == 5, s"expected 5 literals in: $sql")
            val key = (vals(0), vals(1))
            if (entries.contains(key)) {
              val eb = new java.io.ByteArrayOutputStream()
              def fld(code: Char, v: String): Unit = {
                eb.write(code); eb.write(v.getBytes(UTF_8)); eb.write(0)
              }
              fld('S', "ERROR"); fld('C', "23505")
              fld('M', "duplicate key value violates unique " +
                "constraint \"tables_pkey\"")
              eb.write(0)
              out.send('E', eb.toByteArray)
              ready()
            } else {
              entries(key) = vals
              complete("INSERT 0 1"); ready()
            }
          } else if (low.startsWith("select") && low.contains("from tables")) {
            out.send('T', rowDescription(Seq("database", "table",
              "src_table_name", "src_table_uri", "config")))
            entries.values.foreach(v => out.send('D', dataRow(v)))
            complete(s"SELECT ${entries.size}"); ready()
          } else if (low.startsWith("delete from tables")) {
            val vals = literals(sql)
            require(vals.size == 2, s"expected 2 literals in: $sql")
            val n = if (entries.remove((vals(0), vals(1))).isDefined) 1 else 0
            complete(s"DELETE $n"); ready()
          } else throw new IllegalStateException(s"unscripted query: $sql")
        }
      case scala.None => open = false // client closed
      case other => throw new IllegalStateException(s"expected Q, got $other")
    }
  }
}

package graft.sources

import java.io.{DataInputStream, EOFException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.concurrent.Executors
import scala.util.control.NonFatal

/**
 * TCP transport for the S12 RPC protocol: little-endian u32-framed
 * request/response over a plain socket, many requests per connection —
 * the standalone-deployment listener the reference serves on port 3031
 * (`moonlink_service/src/rpc_server.rs`; framing `moonlink_rpc`). The
 * protocol layer itself is [[RpcServer]]; each CONNECTION gets its own
 * instance (the factory), so scan-pin state is per-handle exactly like
 * the reference's per-connection rpc loop — one client can never end
 * another client's scan or observe its in-progress pins — and a
 * dropped connection releases whatever it still pinned.
 */
final class RpcTcpServer(newHandler: () => RpcServer, port: Int = 0) {

  def this(rpc: RpcServer, port: Int) = this(() => rpc, port)

  private val server =
    new ServerSocket(port, 16, InetAddress.getLoopbackAddress)
  private val pool = Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "graft-rpc-tcp"); t.setDaemon(true); t
  })
  @volatile private var running = false

  def boundPort: Int = server.getLocalPort

  def start(): RpcTcpServer = {
    running = true
    pool.submit(new Runnable {
      override def run(): Unit =
        while (running) {
          try {
            val sock = server.accept()
            pool.submit(new Runnable {
              override def run(): Unit = serve(sock)
            })
          } catch {
            case _: Throwable if !running => // closed during shutdown
            case NonFatal(e) =>
              System.err.println(s"[graft-rpc] accept failed: ${e.getMessage}")
          }
        }
    })
    this
  }

  private def serve(sock: Socket): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = sock.getOutputStream
    val rpc = newHandler()
    try {
      sock.setTcpNoDelay(true)
      while (true) {
        val lenBytes = new Array[Byte](4)
        in.readFully(lenBytes) // EOFException on orderly close
        val len = ByteBuffer.wrap(lenBytes)
          .order(ByteOrder.LITTLE_ENDIAN).getInt
        require(len >= 0 && len <= (64 << 20), s"bad frame length $len")
        val body = new Array[Byte](len)
        in.readFully(body)
        // handle() takes the bare body — no re-frame/unframe copy pair
        out.write(RpcWire.frame(rpc.handle(body)))
        out.flush()
      }
    } catch {
      case _: EOFException => // client closed between frames
      case NonFatal(e) if running =>
        System.err.println(s"[graft-rpc] connection error: ${e.getMessage}")
    } finally {
      rpc.closePins() // a vanished client must not pin versions forever
      sock.close()
    }
  }

  def stop(): Unit = {
    running = false
    server.close()
    pool.shutdownNow()
    ()
  }
}

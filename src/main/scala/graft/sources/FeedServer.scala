package graft.sources

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

/** Wire protocol shared by [[FeedServer]] and [[SocketTransport]]: one
  * request line per connection, a status line back, then a counted
  * payload. Messages travel base64-encoded so feed payloads may contain
  * any bytes (embedded newlines, the protocol's own delimiters).
  *
  *   SIZE <feed>                  -> OK 1, <count>
  *   SLICE <feed> <from> <until>  -> OK <n>, <base64 message> x n
  *   POST <feed> <base64>...      -> OK 0
  *   anything else / failure      -> ERR <message>
  *
  * Text-line framing keeps the protocol debuggable with `nc`; one
  * connection per request keeps both sides stateless, so an executor-side
  * task retry simply reconnects.
  */
object FeedProtocol {
  def encode(msg: String): String =
    Base64.getEncoder.encodeToString(msg.getBytes(UTF_8))
  def decode(b64: String): String =
    new String(Base64.getDecoder.decode(b64), UTF_8)

  /** Connect timeout / per-read timeout: a wedged server (accepts but
    * never writes) must fail the Spark task so retry actually fires,
    * instead of blocking a partition reader forever.
    */
  val ConnectTimeoutMs = 10000
  val ReadTimeoutMs = 30000

  /** Send one command line; return the payload lines or throw on ERR. */
  def request(host: String, port: Int, command: String): Seq[String] = {
    val sock = new Socket()
    try {
      sock.connect(new java.net.InetSocketAddress(host, port), ConnectTimeoutMs)
      sock.setSoTimeout(ReadTimeoutMs)
      val out = new BufferedWriter(new OutputStreamWriter(sock.getOutputStream, UTF_8))
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
      out.write(command); out.write("\n"); out.flush()
      val status = in.readLine()
      if (status == null) throw new SocketException(s"feed server at $host:$port closed without replying")
      if (status.startsWith("ERR "))
        throw new IllegalStateException(s"feed server at $host:$port: ${status.drop(4)}")
      require(status.startsWith("OK "), s"malformed feed-server status line: $status")
      val n = status.drop(3).trim.toInt
      (0 until n).map { i =>
        val line = in.readLine()
        if (line == null)
          throw new SocketException(s"feed server at $host:$port truncated payload at line $i of $n")
        line
      }
    } finally sock.close()
  }
}

/** The network half of S1: serves this JVM's [[FeedRegistry]] backlog over
  * TCP so [[SocketTransport]] readers on OTHER JVMs (real executors, not
  * just local[*] threads) can fetch ranges. This is the engine's stand-in
  * for the reference's websocket endpoint (my_websocket.py:62-69): the
  * producer process runs a FeedServer, pushes messages into it (in-process
  * via [[FeedRegistry.post]] or over TCP via [[SocketTransport.post]],
  * the websocket-callback analog), and every Spark partition reader pulls
  * its assigned offset range with a short-lived connection.
  *
  * Accept loop and per-connection handlers are daemon threads; `stop()`
  * closes the listener and ends the loop. Port 0 binds an ephemeral port
  * (read it back from [[boundPort]]).
  */
class FeedServer(port: Int = 0) {
  private val server = new ServerSocket(port)
  @volatile private var running = false

  def boundPort: Int = server.getLocalPort

  private def respond(line: String): Either[String, Seq[String]] =
    try {
      // split on SINGLE spaces, keeping empty tokens: the empty string
      // base64-encodes to "" and a \s+ split would silently collapse it,
      // making the socket path store fewer messages than the registry
      // path for the same post
      val parts = line.split(" ", -1)
      parts(0).toUpperCase match {
        case "SIZE" => Right(Seq(FeedRegistry.size(parts(1)).toString))
        case "SLICE" =>
          Right(FeedRegistry.slice(parts(1), parts(2).toLong, parts(3).toLong)
            .map(kv => FeedProtocol.encode(kv._2)))
        case "POST" =>
          FeedRegistry.post(parts(1), parts.drop(2).toIndexedSeq.map(FeedProtocol.decode): _*)
          Right(Nil)
        case other => Left(s"unknown command: $other")
      }
    } catch {
      case e: Exception => Left(Option(e.getMessage).getOrElse(e.getClass.getName))
    }

  private def handle(sock: Socket): Unit = {
    val t = new Thread(() => {
      try {
        val in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
        val out = new BufferedWriter(new OutputStreamWriter(sock.getOutputStream, UTF_8))
        val line = in.readLine()
        if (line != null) {
          respond(line) match {
            case Left(err) =>
              out.write(s"ERR ${err.replaceAll("[\\r\\n]+", " ")}\n")
            case Right(payload) =>
              out.write(s"OK ${payload.length}\n")
              payload.foreach { l => out.write(l); out.write("\n") }
          }
          out.flush()
        }
      } catch { case _: Exception => () } // connection-level failure: client retries
      finally sock.close()
    })
    t.setDaemon(true)
    t.start()
  }

  def start(): FeedServer = {
    running = true
    val t = new Thread(() => {
      while (running) {
        try handle(server.accept())
        catch {
          case _: SocketException => () // listener closed by stop()
          case e: java.io.IOException =>
            // transient accept failure (e.g. fd exhaustion): log and keep
            // accepting — dying silently would leave a server that looks
            // alive but never answers again
            if (running) System.err.println(
              s"graft-feed-server:$boundPort accept failed: $e")
        }
      }
    })
    t.setDaemon(true)
    t.setName(s"graft-feed-server:$boundPort")
    t.start()
    this
  }

  def stop(): Unit = {
    running = false
    server.close()
  }
}

package graft

import graft.streaming.{StreamSources, WordCountStreams}
import java.io.PrintWriter
import java.net.ServerSocket

/** Drives the socket source (S1) end-to-end against an in-JVM TCP
  * server — the automated form of the reference's
  * `socketTextStream("localhost", 9999)` demo topology. */
class SocketSourceSpec extends SparkTestBase {
  import spark.implicits._

  test("socket source feeds the rolling word count over real TCP") {
    val server = new ServerSocket(0) // ephemeral port
    val port = server.getLocalPort
    @volatile var writer: PrintWriter = null
    val t = new Thread(() => {
      val sock = server.accept()
      writer = new PrintWriter(sock.getOutputStream, true)
      writer.println("hello world")
      writer.println("hello spark")
      // keep the connection open until the query is done
    })
    t.setDaemon(true)
    t.start()
    try {
      val lines = StreamSources.socketLines(spark, "localhost", port)
      val q = WordCountStreams.rollingWordCount(lines)
        .writeStream.format("memory").queryName("sock_out")
        .outputMode("complete").start()
      // poll until the two lines have flowed through (socket sources
      // deliver asynchronously; processAllAvailable alone can race the
      // server thread's writes)
      val deadline = System.currentTimeMillis() + 30000
      var counts = Map.empty[String, Long]
      while (counts.getOrElse("hello", 0L) < 2 && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        q.processAllAvailable()
        counts = spark.table("sock_out").as[(String, Long)].collect().toMap
      }
      q.stop()
      assert(counts === Map("hello" -> 2L, "world" -> 1L, "spark" -> 1L))
    } finally {
      if (writer != null) writer.close()
      server.close()
    }
  }
}

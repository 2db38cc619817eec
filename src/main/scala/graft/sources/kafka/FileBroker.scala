package graft.sources.kafka

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util.Base64
import scala.jdk.CollectionConverters._

/** One record in a mock-broker partition log. `offset` is the line
  * number — per-partition, dense, monotonically increasing, exactly the
  * ordering contract a Kafka partition gives a consumer. */
case class MockRecord(partition: Int, offset: Long, timestampMs: Long,
                      key: Array[Byte], value: Array[Byte])

/** File-backed stand-in for a Kafka broker (S4/K3 integration surface —
  * ref TradeChangeDetectionJob.java:31-41,48). The real
  * spark-sql-kafka-0-10 connector cannot be exercised in this container
  * (no jar, no network), so the contract a broker provides is reproduced
  * on the filesystem and `KafkaMockProvider` speaks it to Spark:
  *
  *   - topic = directory; partition = append-only log file `p<k>.log`
  *   - offset = line number: per-partition dense and ordered, earliest
  *     is 0, latest is the line count — same seek semantics as Kafka
  *   - record = (timestampMs, key-bytes, value-bytes), base64-encoded
  *     so arbitrary binary payloads survive the line format
  *
  * Appends are synchronized per JVM (tests are single-process); the
  * production path swaps `format("graft-kafka")` for `format("kafka")`
  * and none of the downstream topology changes.
  */
object FileBroker {

  private def topicDir(dir: String, topic: String): Path = Paths.get(dir, topic)
  private def logFile(dir: String, topic: String, partition: Int): Path =
    topicDir(dir, topic).resolve(s"p$partition.log")

  def createTopic(dir: String, topic: String, partitions: Int): Unit = synchronized {
    require(partitions > 0, "partitions must be positive")
    Files.createDirectories(topicDir(dir, topic))
    (0 until partitions).foreach { p =>
      val f = logFile(dir, topic, p)
      if (!Files.exists(f)) Files.createFile(f)
    }
  }

  /** Partition ids of a topic (static after createTopic, like a Kafka
    * topic without repartitioning). */
  def partitions(dir: String, topic: String): Seq[Int] = {
    val td = topicDir(dir, topic)
    if (!Files.isDirectory(td)) Seq.empty
    else {
      val s = Files.list(td)
      try s.iterator().asScala.map(_.getFileName.toString)
        .collect { case n if n.startsWith("p") && n.endsWith(".log") =>
          n.stripPrefix("p").stripSuffix(".log").toInt }
        .toSeq.sorted
      finally s.close()
    }
  }

  /** Next offset to be written (= number of records so far). */
  def endOffset(dir: String, topic: String, partition: Int): Long = {
    val f = logFile(dir, topic, partition)
    if (!Files.exists(f)) 0L
    else {
      val s = Files.lines(f, UTF_8)
      try s.count() finally s.close()
    }
  }

  private def enc(b: Array[Byte]): String =
    if (b == null) "-" else Base64.getEncoder.encodeToString(b)
  private def dec(s: String): Array[Byte] =
    if (s == "-") null else Base64.getDecoder.decode(s)

  /** Append one record; returns its offset. Mirrors a producer send with
    * an explicit partition. */
  def send(dir: String, topic: String, partition: Int,
           key: Array[Byte], value: Array[Byte], timestampMs: Long): Long =
    synchronized {
      val off = endOffset(dir, topic, partition)
      val line = s"$timestampMs\t${enc(key)}\t${enc(value)}\n"
      Files.write(logFile(dir, topic, partition), line.getBytes(UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      off
    }

  /** Convenience producer for string records keyed like Kafka's default
    * partitioner (deterministic key-hash → partition; murmur2 in real
    * Kafka, absolute hashCode here — same per-key co-location
    * guarantee). */
  def sendString(dir: String, topic: String, key: String, value: String,
                 timestampMs: Long = 0L): Long = {
    val n = partitions(dir, topic).size
    require(n > 0, s"topic $topic does not exist under $dir")
    val kb = if (key == null) null else key.getBytes(UTF_8)
    val p = if (kb == null) 0 else math.floorMod(java.util.Arrays.hashCode(kb), n)
    send(dir, topic, p, kb, value.getBytes(UTF_8), timestampMs)
  }

  /** Records of one partition in [from, until) — a consumer poll over
    * that offset range. */
  def read(dir: String, topic: String, partition: Int,
           from: Long, until: Long): Seq[MockRecord] = {
    val f = logFile(dir, topic, partition)
    if (!Files.exists(f) || until <= from) Seq.empty
    else {
      val s = Files.lines(f, UTF_8)
      try s.iterator().asScala.zipWithIndex
        .slice(from.toInt, until.toInt)
        .map { case (line, i) =>
          val Array(ts, k, v) = line.split("\t", 3)
          MockRecord(partition, i.toLong, ts.toLong, dec(k), dec(v))
        }.toSeq
      finally s.close()
    }
  }
}

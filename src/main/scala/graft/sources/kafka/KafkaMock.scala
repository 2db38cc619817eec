package graft.sources.kafka

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector speaking the Kafka source/sink contract over
  * a `FileBroker` directory — the integration surface for S4/K3 (ref
  * TradeChangeDetectionJob.java:26-53) in a container with no Kafka jar
  * and no network. The contract, not the transport, is what downstream
  * code depends on, and it is reproduced exactly:
  *
  *   - read schema is the Kafka source's 7 columns
  *     (key, value, topic, partition, offset, timestamp, timestampType)
  *   - `startingOffsets` earliest|latest; resume from the checkpointed
  *     offset map `{"<topic>":{"0":n,...}}` (same JSON shape as
  *     KafkaSourceOffset), making stop/restart exactly-once on the read
  *   - one Spark input partition per broker partition; offsets dense,
  *     per-partition ordered
  *   - sink accepts (value[, key, partition, timestamp]) rows, routes by
  *     explicit partition else key-hash, appends on driver-side epoch
  *     commit (at-least-once on retry — Kafka's own sink guarantee)
  *
  * Register via `format("graft-kafka")`; swap for `format("kafka")` in
  * production and nothing downstream changes.
  */
object KafkaMock {
  val BrokerDirKey = "broker.dir"

  /** The Kafka source schema, field for field. */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  private val partOffRe = """"(\d+)"\s*:\s*(-?\d+)""".r

  /** `{"topic":{"0":5,"1":3}}` → Map(0->5, 1->3). Tolerates the inner
    * map alone. */
  def parseOffsets(json: String): Map[Int, Long] =
    partOffRe.findAllMatchIn(json)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap

  def formatOffsets(topic: String, offs: Map[Int, Long]): String =
    offs.toSeq.sorted.map { case (p, o) => s""""$p":$o""" }
      .mkString(s"""{"$topic":{""", ",", "}}")
}

class KafkaMockProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kafka"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaMock.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KafkaMockTable(properties.asScala.map { case (k, v) => k.toLowerCase -> v }.toMap)
}

/** Offset = per-partition next-line-to-read, serialized in the Kafka
  * source's JSON shape so checkpoints are self-describing. */
case class KafkaMockOffset(topic: String, offsets: Map[Int, Long]) extends Offset {
  override def json(): String = KafkaMock.formatOffsets(topic, offsets)
}

class KafkaMockTable(props: Map[String, String])
    extends Table with SupportsRead with SupportsWrite {

  private def required(key: String): String = props.getOrElse(key,
    throw new IllegalArgumentException(s"graft-kafka requires option '$key'"))
  private lazy val dir = required(KafkaMock.BrokerDirKey)
  // read side subscribes; write side names its target topic
  private lazy val topic = props.get("subscribe")
    .orElse(props.get("topic"))
    .getOrElse(throw new IllegalArgumentException(
      "graft-kafka requires option 'subscribe' (read) or 'topic' (write)"))

  override def name(): String = s"graft-kafka:$topic"
  override def schema(): StructType = KafkaMock.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = KafkaMock.schema
      override def toBatch: Batch = new KafkaMockBatch(dir, topic)
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new KafkaMockMicroBatchStream(dir, topic,
          startLatest = props.get("startingoffsets").exists(_.equalsIgnoreCase("latest")))
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new KafkaMockWrite(dir, topic, info.schema())
        override def toStreaming: StreamingWrite = new KafkaMockWrite(dir, topic, info.schema())
      }
    }
}

// ---------------------------------------------------------------- read

class KafkaMockMicroBatchStream(dir: String, topic: String, startLatest: Boolean)
    extends MicroBatchStream {

  private def current(): KafkaMockOffset =
    KafkaMockOffset(topic, FileBroker.partitions(dir, topic)
      .map(p => p -> FileBroker.endOffset(dir, topic, p)).toMap)

  override def initialOffset(): Offset =
    if (startLatest) current()
    else KafkaMockOffset(topic,
      FileBroker.partitions(dir, topic).map(_ -> 0L).toMap)

  override def latestOffset(): Offset = current()

  override def deserializeOffset(json: String): Offset =
    KafkaMockOffset(topic, KafkaMock.parseOffsets(json))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[KafkaMockOffset].offsets
    val until = end.asInstanceOf[KafkaMockOffset].offsets
    until.toSeq.sorted.collect {
      case (p, hi) if hi > from.getOrElse(p, 0L) =>
        KafkaMockInputPartition(dir, topic, p, from.getOrElse(p, 0L), hi)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = KafkaMockReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Batch scan = the whole retained log, earliest→latest (what
  * `spark.read.format("kafka")` does with default offsets). */
class KafkaMockBatch(dir: String, topic: String) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    FileBroker.partitions(dir, topic).map { p =>
      KafkaMockInputPartition(dir, topic, p, 0L, FileBroker.endOffset(dir, topic, p))
    }.toArray
  override def createReaderFactory(): PartitionReaderFactory = KafkaMockReaderFactory
}

case class KafkaMockInputPartition(dir: String, topic: String, partition: Int,
                                   from: Long, until: Long) extends InputPartition

object KafkaMockReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KafkaMockInputPartition]
    new PartitionReader[InternalRow] {
      private val it = FileBroker.read(p.dir, p.topic, p.partition, p.from, p.until).iterator
      private var cur: MockRecord = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        cur.key, cur.value, UTF8String.fromString(p.topic), cur.partition,
        cur.offset, cur.timestampMs * 1000L, 1 /* LogAppendTime: broker stamps */))
      override def close(): Unit = ()
    }
  }
}

// --------------------------------------------------------------- write

/** Buffered record routed at commit: `partition` < 0 means "derive from
  * key hash" (Kafka's default partitioner role). */
private[kafka] case class PendingRecord(partition: Int, key: Array[Byte],
                                        value: Array[Byte], timestampMs: Long)
private[kafka] case class KafkaMockCommit(records: Seq[PendingRecord])
    extends WriterCommitMessage

/** Tasks buffer rows into the commit message; the driver appends them
  * partition-grouped on epoch commit. A retried epoch re-appends — the
  * same at-least-once guarantee the real Kafka sink has. */
class KafkaMockWrite(dir: String, topic: String, schema: StructType)
    extends BatchWrite with StreamingWrite {

  // both parents default this; Scala requires an explicit arbiter
  override def useCommitCoordinator(): Boolean = true

  private val factory = KafkaMockWriterFactory(
    schema.fieldNames.indexOf("value"),
    schema.fieldNames.indexOf("key"),
    schema.fieldNames.indexOf("partition"),
    schema.fieldNames.indexOf("timestamp"),
    schema)
  require(factory.valueIdx >= 0, "graft-kafka sink requires a 'value' column")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = factory
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = factory

  private def append(messages: Array[WriterCommitMessage]): Unit = {
    val n = FileBroker.partitions(dir, topic).size
    require(n > 0, s"topic $topic does not exist under $dir")
    messages.foreach {
      case KafkaMockCommit(records) => records.foreach { r =>
        val p = if (r.partition >= 0) r.partition
                else if (r.key == null) 0
                else math.floorMod(java.util.Arrays.hashCode(r.key), n)
        FileBroker.send(dir, topic, p, r.key, r.value, r.timestampMs)
      }
      case _ => ()
    }
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = append(messages)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = append(messages)
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

case class KafkaMockWriterFactory(valueIdx: Int, keyIdx: Int, partIdx: Int,
                                  tsIdx: Int, schema: StructType)
    extends DataWriterFactory with StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    writer
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    writer

  private def bytesAt(row: InternalRow, i: Int): Array[Byte] =
    if (i < 0 || row.isNullAt(i)) null
    else schema.fields(i).dataType match {
      case BinaryType => row.getBinary(i)
      case StringType => row.getUTF8String(i).getBytes
      case t => throw new IllegalArgumentException(
        s"graft-kafka sink: column ${schema.fieldNames(i)} must be string or binary, got $t")
    }

  private def writer: DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[PendingRecord]
    override def write(row: InternalRow): Unit = buf += PendingRecord(
      if (partIdx >= 0 && !row.isNullAt(partIdx)) row.getInt(partIdx) else -1,
      bytesAt(row, keyIdx),
      bytesAt(row, valueIdx),
      if (tsIdx >= 0 && !row.isNullAt(tsIdx)) row.getLong(tsIdx) / 1000L else 0L)
    override def commit(): WriterCommitMessage = KafkaMockCommit(buf.toSeq)
    override def abort(): Unit = buf.clear()
    override def close(): Unit = ()
  }
}

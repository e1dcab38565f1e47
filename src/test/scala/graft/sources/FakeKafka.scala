package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{ConcurrentHashMap, CopyOnWriteArrayList}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** TEST-SCOPE stand-in for the Kafka connector: an in-memory broker plus a
 * DataSourceV2 registered under the short name `kafka`, so
 * [[KafkaTopics.readTopic]] / [[KafkaTopics.writeTopic]] /
 * [[KafkaTopics.ljotTopology]] — whose `format("kafka")` leaf cannot
 * resolve in this zero-egress build (`spark-sql-kafka-0-10` absent) — can
 * be exercised end-to-end: real micro-batch planning, real wire schema,
 * real offsets, real streaming write commits; only the network is fake.
 * The same role the embedded broker plays in the reference's test suite
 * (`LeftJoinOnTimeoutTest.java:201-216`), at the same fidelity boundary.
 *
 * local-mode only (the broker is a JVM-global map — executors must share
 * the driver JVM), which is exactly the test environment. */
object FakeBroker {
  /** One stored record; timestamps in MICROseconds (Spark internal). */
  case class Rec(key: String, value: String, tsMicros: Long)

  private val topics = new ConcurrentHashMap[String, CopyOnWriteArrayList[Rec]]()
  private def list(topic: String): CopyOnWriteArrayList[Rec] =
    topics.computeIfAbsent(topic, _ => new CopyOnWriteArrayList[Rec]())

  def publish(topic: String, key: String, value: String, tsMillis: Long): Unit =
    list(topic).add(Rec(key, value, tsMillis * 1000L))
  def size(topic: String): Long = list(topic).size().toLong
  def slice(topic: String, from: Int, until: Int): Array[Rec] = {
    val l = list(topic)
    (from until math.min(until, l.size())).map(l.get).toArray
  }
  def all(topic: String): Seq[Rec] = list(topic).asScala.toSeq
  def clear(): Unit = topics.clear()

  /** The real connector's read schema (its fixed output contract). */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))
}

/** Registered via META-INF/services as short name `kafka` (test classpath
 * only — on a cluster the real connector owns the name). */
class FakeKafkaSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kafka"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = FakeBroker.wireSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new FakeKafkaTable(new CaseInsensitiveStringMap(properties))
}

class FakeKafkaTable(options: CaseInsensitiveStringMap) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"fake_kafka(${options.asCaseSensitiveMap().asScala.getOrElse("subscribe", options.asCaseSensitiveMap().asScala.getOrElse("topic", "?"))})"
  override def schema(): StructType = FakeBroker.wireSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val topic = Option(opts.get("subscribe")).getOrElse(options.get("subscribe"))
    val maxPerTrigger = Option(opts.get("maxOffsetsPerTrigger"))
      .orElse(Option(options.get("maxOffsetsPerTrigger"))).map(_.toLong)
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = FakeBroker.wireSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new FakeKafkaMicroBatch(topic, maxPerTrigger)
      }
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val topic = Option(info.options.get("topic")).getOrElse(options.get("topic"))
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite =
          new FakeKafkaStreamingWrite(topic, info.schema())
      }
    }
  }
}

private case class FakeOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

/** Micro-batch stream with admission control, mirroring the real
 * connector: `maxOffsetsPerTrigger` caps each batch's offset range (the
 * rate limit [[KafkaTopics.ljotTopology]] maps from `scheduledCapacity`,
 * O10), so a backlog drains over several bounded micro-batches instead of
 * one unbounded one. As in the real source, the limit-less
 * `latestOffset()` is never called once `SupportsAdmissionControl` is
 * implemented (the engine always passes a ReadLimit). */
private class FakeKafkaMicroBatch(topic: String, maxPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl {
  override def initialOffset(): Offset = FakeOffset(0L)
  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[FakeOffset].n
    val end = FakeBroker.size(topic)
    limit match {
      case r: ReadMaxRows => FakeOffset(math.min(end, s + r.maxRows()))
      case _              => FakeOffset(end)
    }
  }
  override def reportLatestOffset(): Offset = FakeOffset(FakeBroker.size(topic))
  override def deserializeOffset(json: String): Offset = FakeOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FakeOffset].n.toInt
    val e = end.asInstanceOf[FakeOffset].n.toInt
    Array(FakeKafkaPartition(topic, FakeBroker.slice(topic, s, e), s))
  }
  override def createReaderFactory(): PartitionReaderFactory = new FakeKafkaReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private case class FakeKafkaPartition(topic: String, recs: Array[FakeBroker.Rec], base: Int)
    extends InputPartition

private class FakeKafkaReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val fp = p.asInstanceOf[FakeKafkaPartition]
      private var i = -1
      override def next(): Boolean = { i += 1; i < fp.recs.length }
      override def get(): InternalRow = {
        val r = fp.recs(i)
        new GenericInternalRow(Array[Any](
          if (r.key == null) null else r.key.getBytes(UTF_8),
          if (r.value == null) null else r.value.getBytes(UTF_8),
          UTF8String.fromString(fp.topic),
          0, (fp.base + i).toLong, r.tsMicros, 0))
      }
      override def close(): Unit = ()
    }
}

private class FakeKafkaStreamingWrite(topic: String, schema: StructType)
    extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new FakeKafkaWriterFactory(topic, schema)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

private class FakeKafkaWriterFactory(topic: String, schema: StructType)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val ki = schema.fieldIndex("key")
      private val vi = schema.fieldIndex("value")
      private val ti = if (schema.fieldNames.contains("timestamp")) schema.fieldIndex("timestamp") else -1
      private def str(row: InternalRow, i: Int): String =
        if (row.isNullAt(i)) null
        else schema(i).dataType match {
          case BinaryType => new String(row.getBinary(i), UTF_8)
          case _          => row.getUTF8String(i).toString
        }
      override def write(row: InternalRow): Unit = {
        val tsMicros = if (ti >= 0 && !row.isNullAt(ti)) row.getLong(ti)
                       else System.currentTimeMillis() * 1000L
        FakeBroker.publish(topic, str(row, ki), str(row, vi), tsMicros / 1000L)
      }
      override def commit(): WriterCommitMessage = new WriterCommitMessage {}
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

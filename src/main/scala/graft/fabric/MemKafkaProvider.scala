package graft.fabric

import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

/** `graft-kafka-mem`: a Spark DSv2 streaming source + sink over
  * [[MemBroker]] that speaks the kafka connector's contract — same options
  * (`kafka.bootstrap.servers` carries the broker id, `subscribe`, `topic`,
  * `startingOffsets`, `includeHeaders`), same source columns (`key, value,
  * topic, partition, offset, timestamp, timestampType[, headers]`), same
  * sink columns (`value` required, binary or string; `key`, `topic`,
  * `partition`, `headers` optional; the `topic` OPTION overrides a topic
  * column, exactly like the real sink — dynamic `ITopicNameExtractor`
  * routing, the reference's `SinkProcessor.cs:6-55`, passes no option and
  * routes on the column). `StreamsBuilder.kafkaStream` / `Sinks.toKafka*` therefore
  * run UNCHANGED against the fabric with only the format token swapped,
  * executing the full micro-batch/checkpoint/restart machinery this
  * container could never drive against a real broker.
  *
  * The streaming sink is EXACTLY-ONCE: every epoch commits through
  * [[MemBroker.commitEpoch]]'s (queryId, epochId) ledger, so a replayed
  * epoch after a crash-between-commit-and-ack appends nothing — the
  * transactional-producer semantics of the reference's EOS mode
  * (`core/Processors/StreamTask.cs:93-110`) expressed as Spark's
  * checkpoint-epoch idempotence. (Spark's real kafka sink is at-least-once;
  * on a cluster EOS needs a transactional producer in the connector — the
  * fabric proves the engine-side mechanism.)
  */
final class MemKafkaProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kafka-mem"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MemKafka.sourceSchema(options.getBoolean("includeHeaders", false))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new MemKafkaTable(new CaseInsensitiveStringMap(properties))
}

private[fabric] object MemKafka {
  val headersType: ArrayType = ArrayType(
    StructType(Seq(StructField("key", StringType),
      StructField("value", BinaryType))))

  def sourceSchema(includeHeaders: Boolean): StructType = {
    val base = StructType(Seq(
      StructField("key", BinaryType),
      StructField("value", BinaryType),
      StructField("topic", StringType),
      StructField("partition", IntegerType),
      StructField("offset", LongType),
      StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType)))
    if (includeHeaders) base.add(StructField("headers", headersType)) else base
  }

  def brokerId(options: CaseInsensitiveStringMap): String = {
    val id = options.getOrDefault("kafka.bootstrap.servers",
      options.getOrDefault("broker", null))
    require(id != null,
      "graft-kafka-mem needs kafka.bootstrap.servers (the MemBroker id)")
    id
  }

  def subscribed(options: CaseInsensitiveStringMap): Seq[String] = {
    val s = options.getOrDefault("subscribe", null)
    require(s != null, "graft-kafka-mem source needs a subscribe option")
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** {"topic":{"0":12,...},...} — the kafka source's offset-json shape. */
  def offsetsToJson(m: Map[String, Seq[Long]]): String = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    m.toSeq.sortBy(_._1).foreach { case (t, offs) =>
      val tn = root.putObject(t)
      offs.zipWithIndex.foreach { case (o, p) => tn.put(p.toString, o) }
    }
    root.toString
  }

  def offsetsFromJson(json: String): Map[String, Seq[Long]] = {
    val root = new ObjectMapper().readTree(json)
    root.properties().asScala.map { e =>
      val parts = e.getValue.properties().asScala
        .map(pe => pe.getKey.toInt -> pe.getValue.asLong()).toSeq.sortBy(_._1)
      e.getKey -> parts.map(_._2)
    }.toMap
  }
}

private[fabric] final case class MemOffset(offsets: Map[String, Seq[Long]])
    extends Offset {
  override def json(): String = MemKafka.offsetsToJson(offsets)
  override def equals(other: Any): Boolean = other match {
    case o: MemOffset => json() == o.json()
    case _ => false
  }
  override def hashCode(): Int = json().hashCode
}

private[fabric] final class MemKafkaTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String =
    s"graft-kafka-mem(${MemKafka.brokerId(options)})"
  override def schema(): StructType =
    MemKafka.sourceSchema(options.getBoolean("includeHeaders", false))
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_READ, TableCapability.STREAMING_WRITE,
      TableCapability.BATCH_WRITE, TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new java.util.HashMap[String, String]()
    merged.putAll(options.asCaseSensitiveMap())
    merged.putAll(o.asCaseSensitiveMap())
    new MemKafkaScan(new CaseInsensitiveStringMap(merged))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    // SupportsStreamingUpdateAsAppend: update-mode changelogs (windowed
    // counts etc.) append every update as a record — exactly how the real
    // kafka sink publishes changelog topics
    new WriteBuilder
        with org.apache.spark.sql.internal.connector.SupportsStreamingUpdateAsAppend {
      override def build(): Write = new MemKafkaWrite(
        MemKafka.brokerId(options), Option(options.get("topic")),
        info.queryId(), info.schema())
    }
}

private[fabric] final class MemKafkaScan(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan {
  private val includeHeaders = options.getBoolean("includeHeaders", false)
  private val broker = MemKafka.brokerId(options)
  private val topics = MemKafka.subscribed(options)

  override def build(): Scan = this
  override def readSchema(): StructType = MemKafka.sourceSchema(includeHeaders)
  override def description(): String = s"MemKafkaScan(${topics.mkString(",")})"

  private def currentEnd(): Map[String, Seq[Long]] = {
    val b = MemBroker.get(broker)
    topics.map(t => t -> b.endOffsets(t).toSeq).toMap
  }
  private def zeros(): Map[String, Seq[Long]] = {
    val b = MemBroker.get(broker)
    topics.map(t => t -> Seq.fill(b.partitionCount(t))(0L)).toMap
  }
  /** `minPartitions` (same option as the real kafka source): when the
    * non-empty offset ranges number fewer than this, split ranges into
    * contiguous sub-ranges — pieces per range proportional to its record
    * count (ceil), every piece non-empty — so a hot topic-partition fans
    * out across idle cores instead of serializing one task. 0 = off.
    */
  private val minPartitions: Int = {
    val mp = options.getInt("minPartitions", 0)
    require(mp >= 0, s"minPartitions must be non-negative (0 = off), got $mp")
    mp
  }

  private def partitionsBetween(from: Map[String, Seq[Long]],
      until: Map[String, Seq[Long]]): Array[InputPartition] = {
    val ranges =
      for {
        t <- topics
        p <- until(t).indices
        lo = from.getOrElse(t, Seq.empty).applyOrElse[Int, Long](p, _ => 0L)
        hi = until(t)(p)
        if hi > lo
      } yield (t, p, lo, hi)
    val split =
      if (minPartitions <= ranges.size) ranges
      else {
        val totalSize = ranges.map { case (_, _, lo, hi) => hi - lo }.sum.toDouble
        ranges.flatMap { case (t, p, lo, hi) =>
          val size = hi - lo
          val parts = math.max(1, math.ceil(size / totalSize * minPartitions).toInt)
          (0 until parts).flatMap { i =>
            val a = lo + size * i / parts
            val b = lo + size * (i + 1) / parts
            if (b > a) Some((t, p, a, b)) else None
          }
        }
      }
    split.map { case (t, p, lo, hi) =>
      MemInputPartition(broker, t, p, lo, hi, includeHeaders): InputPartition
    }.toArray
  }

  override def toBatch: Batch = new Batch {
    // snapshot once at planning, like the kafka batch source's resolved range
    private val end = currentEnd()
    override def planInputPartitions(): Array[InputPartition] =
      partitionsBetween(zeros(), end)
    override def createReaderFactory(): PartitionReaderFactory =
      MemKafkaReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream {
      override def initialOffset(): Offset = {
        // the real source also accepts per-partition offset JSON; fail
        // loud rather than silently reading from latest
        val so = options.getOrDefault("startingOffsets", "latest")
          .trim.toLowerCase(java.util.Locale.ROOT)
        require(so == "earliest" || so == "latest",
          s"graft-kafka-mem supports startingOffsets earliest|latest, got '$so'")
        if (so == "earliest") MemOffset(zeros()) else MemOffset(currentEnd())
      }
      override def latestOffset(): Offset = MemOffset(currentEnd())
      override def deserializeOffset(json: String): Offset =
        MemOffset(MemKafka.offsetsFromJson(json))
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
        partitionsBetween(start.asInstanceOf[MemOffset].offsets,
          end.asInstanceOf[MemOffset].offsets)
      override def createReaderFactory(): PartitionReaderFactory =
        MemKafkaReaderFactory
      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()
    }
}

private[fabric] final case class MemInputPartition(broker: String,
    topic: String, partition: Int, from: Long, until: Long,
    includeHeaders: Boolean) extends InputPartition

private[fabric] object MemKafkaReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[MemInputPartition]
    val rows = MemBroker.get(p.broker).fetch(p.topic, p.partition, p.from, p.until)
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val (off, r) = rows(i)
        val base = Array[Any](
          r.key, r.value, UTF8String.fromString(p.topic),
          p.partition, off, r.timestampMs * 1000L /* micros */,
          0 /* CreateTime, like the kafka source */)
        val all =
          if (!p.includeHeaders) base
          else base :+ (new GenericArrayData(r.headers.map { case (k, v) =>
            new GenericInternalRow(Array[Any](UTF8String.fromString(k), v))
          }.toArray): ArrayData)
        new GenericInternalRow(all)
      }
      override def close(): Unit = ()
    }
  }
}

/** Write side: resolves the sink columns once from the input schema, buffers
  * per task, applies on the driver through the broker's epoch ledger
  * (streaming) or a plain append (batch).
  */
private[fabric] final class MemKafkaWrite(broker: String,
    topicOption: Option[String], queryId: String, schema: StructType)
    extends Write with Serializable {

  private def fieldIndex(name: String): Int = schema.fieldNames.indexOf(name)
  /** key/value accept binary OR string (the real sink casts strings to
    * UTF-8 bytes); anything else fails HERE, at plan time, not as an
    * opaque executor ClassCastException.
    */
  private def bytesIdx(name: String, required: Boolean): (Int, Boolean) = {
    val i = fieldIndex(name)
    require(i >= 0 || !required, s"graft-kafka-mem sink needs a $name column")
    if (i < 0) (i, false)
    else schema(i).dataType match {
      case BinaryType => (i, false)
      case StringType => (i, true)
      case dt => throw new IllegalArgumentException(
        s"$name must be binary or string, got ${dt.simpleString}")
    }
  }
  private val (valueIdx, valueIsString) = bytesIdx("value", required = true)
  private val (keyIdx, keyIsString) = bytesIdx("key", required = false)
  private val topicIdx = fieldIndex("topic")
  require(topicIdx >= 0 || topicOption.isDefined,
    "no topic option and no topic column — the kafka sink contract")
  require(topicIdx < 0 || schema(topicIdx).dataType == StringType,
    s"topic column must be string, got ${schema(topicIdx).dataType.simpleString}")
  private val partitionIdx = fieldIndex("partition")
  private val headersIdx = fieldIndex("headers")

  private val mapper = MemRecordMapper(topicOption, valueIdx, valueIsString,
    keyIdx, keyIsString, topicIdx, partitionIdx, headersIdx)

  private def gathered(messages: Array[WriterCommitMessage]) =
    messages.toSeq.collect { case MemTaskRows(rows) => rows }.flatten

  override def toStreaming: StreamingWrite = new MemStreamingWrite(
    broker, queryId, mapper, gathered)

  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      new MemKafkaWriterFactory(mapper)
    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val b = MemBroker.get(broker)
      gathered(messages).foreach { case (t, p, r) => b.produce(t, p, r) }
    }
    override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  }
}

/** Driver-side streaming half: every epoch lands through the broker's
  * (queryId, epochId) ledger — the exactly-once gate.
  */
private[fabric] final class MemStreamingWrite(broker: String, queryId: String,
    mapper: MemRecordMapper,
    gathered: Array[WriterCommitMessage] => Seq[(String, Option[Int], MemBroker.Record)])
    extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new MemKafkaWriterFactory(mapper)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    MemBroker.get(broker).commitEpoch(queryId, epochId, gathered(messages))
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

/** Pure row → record projection with pre-resolved field ordinals — the only
  * state the executor-side writer needs, so it ships as one small value.
  * Contract notes (matching the real kafka sink): the `topic` OPTION
  * overrides any topic column in the data; string key/value cast to UTF-8
  * bytes; there is no timestamp column in the sink contract — the broker
  * stamps produce time, like a real broker's log-append/producer time.
  */
private[fabric] final case class MemRecordMapper(topicOption: Option[String],
    valueIdx: Int, valueIsString: Boolean, keyIdx: Int, keyIsString: Boolean,
    topicIdx: Int, partitionIdx: Int, headersIdx: Int) extends Serializable {
  private def bytesAt(row: InternalRow, i: Int, isString: Boolean): Array[Byte] =
    if (isString) row.getUTF8String(i).getBytes else row.getBinary(i)
  def recordOf(row: InternalRow): (String, Option[Int], MemBroker.Record) = {
    val topic = topicOption.getOrElse {
      if (topicIdx >= 0 && !row.isNullAt(topicIdx))
        row.getUTF8String(topicIdx).toString
      else throw new IllegalArgumentException(
        "null topic column and no topic option")
    }
    val part =
      if (partitionIdx >= 0 && !row.isNullAt(partitionIdx))
        Some(row.getInt(partitionIdx)) else None
    val key =
      if (keyIdx >= 0 && !row.isNullAt(keyIdx)) bytesAt(row, keyIdx, keyIsString)
      else null
    val value =
      if (row.isNullAt(valueIdx)) null else bytesAt(row, valueIdx, valueIsString)
    val headers =
      if (headersIdx < 0 || row.isNullAt(headersIdx)) Seq.empty[(String, Array[Byte])]
      else {
        val arr = row.getArray(headersIdx)
        (0 until arr.numElements()).map { j =>
          val s = arr.getStruct(j, 2)
          s.getUTF8String(0).toString -> s.getBinary(1)
        }
      }
    (topic, part,
      MemBroker.Record(key, value, System.currentTimeMillis(), headers))
  }
}

private[fabric] final case class MemTaskRows(
    rows: Seq[(String, Option[Int], MemBroker.Record)])
    extends WriterCommitMessage

private[fabric] final class MemKafkaWriterFactory(mapper: MemRecordMapper)
    extends StreamingDataWriterFactory with DataWriterFactory {
  private def writer(): DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private val buf = new ArrayBuffer[(String, Option[Int], MemBroker.Record)]()
    override def write(row: InternalRow): Unit = buf += mapper.recordOf(row)
    override def commit(): WriterCommitMessage = MemTaskRows(buf.toSeq)
    override def abort(): Unit = buf.clear()
    override def close(): Unit = ()
  }
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = writer()
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    writer()
}

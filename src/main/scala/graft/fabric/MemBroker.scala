package graft.fabric

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** In-JVM broker with KAFKA SEMANTICS — topics of numbered partitions,
  * append-only logs with dense offsets, per-record timestamps and headers,
  * Kafka's murmur2 key partitioner, and an EPOCH COMMIT LEDGER for
  * exactly-once streaming writes.
  *
  * Purpose: this build container has no Kafka broker, no connector jar, and
  * no network egress, so the reference's broker-driven runtime
  * (`core/Processors/SourceProcessor.cs:17-62`, `SinkProcessor.cs:6-55`,
  * `core/Kafka/Internal/RecordCollector.cs:85-171`) could never be
  * EXECUTED end-to-end here — only construct-checked. The fabric closes
  * that gap: [[MemKafkaProvider]] exposes this broker to Spark as a DSv2
  * streaming source AND sink that speak the kafka connector's exact option
  * and column contract, so `kafkaStream`/`toKafka`/`toKafkaDynamic` run
  * their real plans (micro-batches, checkpoints, restarts, per-row topic
  * routing) against it with only the format token swapped. The env-gated
  * live-broker suite (`KafkaIntegrationSpec`) stays, unchanged, for
  * deployments that have a real broker.
  *
  * SCOPE: a single-JVM test/dev fabric. The registry is a process-global
  * map — executors resolve the broker by id, which holds in `local[*]`
  * (exactly where a test broker is meaningful) and intentionally NOT on a
  * multi-JVM cluster, where a real broker exists. Fail-loud lookup, no
  * silent empty topics.
  */
final class MemBroker private[fabric] (val id: String) {

  import MemBroker.Record

  private final class Partition {
    val log = new ArrayBuffer[Record]()
    def append(r: Record): Long = log.synchronized { log += r; log.size - 1L }
    def end: Long = log.synchronized(log.size.toLong)
    def slice(from: Long, until: Long): IndexedSeq[(Long, Record)] =
      log.synchronized {
        val hi = math.min(until, log.size.toLong)
        (math.max(from, 0L) until hi).map(o => o -> log(o.toInt))
      }
  }

  private val topics = new ConcurrentHashMap[String, Array[Partition]]()
  private val roundRobin = new AtomicInteger(0)
  // highest epoch applied per queryId: the exactly-once ledger — a
  // replayed epoch (checkpoint retry after a lost ack) appends nothing
  // the second time. Micro-batch epochs are strictly increasing per
  // query, so the watermark is O(1) per query instead of an
  // unboundedly-growing (queryId, epochId) set — the shape that survives
  // a long-running stream
  private val committed = new ConcurrentHashMap[String, Long]()
  /** Test hook: make the NEXT streaming commit apply its records and then
    * throw — "records landed, ack lost", the duplicate-generator scenario
    * an at-least-once sink cannot survive.
    */
  val failNextCommit = new AtomicBoolean(false)

  def createTopic(topic: String, partitions: Int = 1): Unit = {
    require(partitions >= 1, s"need >= 1 partitions, got $partitions")
    topics.putIfAbsent(topic, Array.fill(partitions)(new Partition))
    // idempotent on a matching layout, LOUD on a mismatch: a reader's
    // endOffsets may have auto-created the topic with 1 partition already,
    // and silently ignoring the requested count would skew murmur2
    // placement and make explicit-partition produces throw later
    val existing = topics.get(topic).length
    require(existing == partitions,
      s"topic '$topic' already exists with $existing partition(s); " +
        s"createTopic($partitions) cannot change the layout — create the " +
        "topic before any producer/consumer touches it")
  }

  private def partitionsOf(topic: String): Array[Partition] = {
    // Kafka-style auto-create (1 partition) WITHOUT the layout validation:
    // touching an existing multi-partition topic must not throw
    topics.putIfAbsent(topic, Array(new Partition))
    topics.get(topic)
  }

  def partitionCount(topic: String): Int = partitionsOf(topic).length

  def topicNames: Seq[String] = topics.keys.asScala.toSeq.sorted

  /** Append one record. Partition choice follows Kafka's producer: an
    * explicit partition wins; else murmur2(key) mod partitions; null keys
    * round-robin. Returns (partition, offset).
    */
  def produce(topic: String, partition: Option[Int], rec: Record): (Int, Long) = {
    val parts = partitionsOf(topic)
    val p = partition.getOrElse {
      if (rec.key != null)
        (MemBroker.murmur2(rec.key) & 0x7fffffff) % parts.length
      else math.floorMod(roundRobin.getAndIncrement(), parts.length)
    }
    require(p >= 0 && p < parts.length,
      s"partition $p out of range for $topic (${parts.length} partitions)")
    (p, parts(p).append(rec))
  }

  def endOffsets(topic: String): Array[Long] = partitionsOf(topic).map(_.end)

  def fetch(topic: String, partition: Int, from: Long, until: Long)
      : IndexedSeq[(Long, Record)] =
    partitionsOf(topic)(partition).slice(from, until)

  /** Exactly-once streaming commit: apply `records` iff (queryId, epochId)
    * has not been applied before. Returns true when the records were
    * appended, false for a deduplicated replay. The [[failNextCommit]]
    * hook throws AFTER applying+recording — the lost-ack injection.
    */
  def commitEpoch(queryId: String, epochId: Long,
      records: Seq[(String, Option[Int], Record)]): Boolean = {
    val applied = committed.synchronized {
      val max = committed.getOrDefault(queryId, Long.MinValue)
      if (epochId <= max) false // replay of an already-applied epoch
      else {
        records.foreach { case (t, p, r) => produce(t, p, r) }
        committed.put(queryId, epochId)
        true
      }
    }
    if (failNextCommit.getAndSet(false))
      throw new IllegalStateException(
        s"[MemBroker.$id] injected commit failure for epoch $epochId " +
          "(records applied, ack lost)")
    applied
  }
}

object MemBroker {

  /** One record on the log — the kafka connector's column contract minus
    * the broker-assigned (topic, partition, offset).
    */
  final case class Record(key: Array[Byte], value: Array[Byte],
      timestampMs: Long, headers: Seq[(String, Array[Byte])])

  private val registry = new ConcurrentHashMap[String, MemBroker]()

  /** Start (or return) the broker registered under `id` — the "bootstrap
    * servers" of the fabric.
    */
  def start(id: String): MemBroker =
    registry.computeIfAbsent(id, new MemBroker(_))

  /** The running broker for `id`; fails loud when nothing was started (a
    * typo'd id must not read as an empty cluster).
    */
  def get(id: String): MemBroker = {
    val b = registry.get(id)
    require(b != null,
      s"no MemBroker '$id' is running in this JVM — call MemBroker.start " +
        "first (the fabric is single-process by design; use a real broker " +
        "plus the kafka connector on a cluster)")
    b
  }

  def stop(id: String): Unit = registry.remove(id)

  /** Kafka's default-partitioner hash (murmur2, the published algorithm
    * with Kafka's seed), so fabric partition placement matches what a real
    * producer with the same key layout would do.
    */
  def murmur2(data: Array[Byte]): Int = {
    val length = data.length
    val seed = 0x9747b28c
    val m = 0x5bd1e995
    val r = 24
    var h = seed ^ length
    val length4 = length / 4
    var i = 0
    while (i < length4) {
      val i4 = i * 4
      var k = (data(i4) & 0xff) + ((data(i4 + 1) & 0xff) << 8) +
        ((data(i4 + 2) & 0xff) << 16) + ((data(i4 + 3) & 0xff) << 24)
      k *= m
      k ^= k >>> r
      k *= m
      h *= m
      h ^= k
      i += 1
    }
    (length % 4) match {
      case 3 =>
        h ^= (data((length & ~3) + 2) & 0xff) << 16
        h ^= (data((length & ~3) + 1) & 0xff) << 8
        h ^= data(length & ~3) & 0xff
        h *= m
      case 2 =>
        h ^= (data((length & ~3) + 1) & 0xff) << 8
        h ^= data(length & ~3) & 0xff
        h *= m
      case 1 =>
        h ^= data(length & ~3) & 0xff
        h *= m
      case _ =>
    }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }
}

package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.{Base64, UUID}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** An embedded, file-backed stand-in for the Kafka connector — the
  * jar-free seam test for S1/K3 (r10 verdict item #4: this box ships
  * no spark-sql-kafka/kafka-clients jars, so `format("kafka")` can
  * never instantiate; the COLUMNAR CONTRACT is still fully testable).
  *
  * The source exposes the EXACT Kafka source schema — (key binary,
  * value binary, topic string, partition int, offset long, timestamp
  * timestamp, timestampType int), in that order — and the sink accepts
  * the Kafka sink contract: a required `value` column, optional `key`
  * and `topic` columns (string or binary, strings cast to UTF-8 bytes,
  * topic falling back to the `topic` option), optional `timestamp`.
  * Records persist as one TSV line each (topic, base64 key, base64
  * value, epoch-ms timestamp) in plain files under `path`.
  *
  * Partition/offset semantics mirror Kafka's: partition =
  * (murmur2(key) & 0x7fffffff) % numPartitions — the default
  * partitioner's published algorithm, empty keys hashed like any
  * other bytes — with null keys pinned to partition 0 (a real broker
  * round-robins; nondeterministic, so deviating is the point);
  * offsets are dense per (topic, partition) and assigned in ARRIVAL
  * order (sorted record-file name, then line), Kafka's append-order
  * semantic: stable for a given topic directory across re-reads,
  * splits, rate limits, and checkpoint resumes. The scan exists in
  * BOTH Kafka forms — batch (`read`) and micro-batch streaming
  * (`readStream`, incremental at record granularity with
  * checkpoint-resumable offsets and the source's admission-control
  * contract: `maxOffsetsPerTrigger` caps records per micro-batch,
  * honored under AvailableNow via SupportsTriggerAvailableNow exactly
  * as the real source does).
  *
  * Scale posture: this is a TEST seam (sources/sinks of record in
  * production are the real connector); each read task scans the full
  * record-file set and keeps only its partition's rows, which is fine
  * for contract tests and wrong for TBs — documented, deliberate.
  *
  * Reference shape: src/consumer/spark_processor.py:116-133 (consumer
  * config + schema), src/consumer/sinks.py:181-202 (producer
  * projection).
  */
object TestKafka {
  val ShortName = "graft-testkafka"

  /** The Kafka source's fixed read schema, field-for-field. */
  val ReadSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Kafka's default-partitioner murmur2 (32-bit, seed 0x9747b28c) —
    * re-implemented from the published algorithm so keyed records land
    * on the same partition a real broker would put them on.
    */
  def murmur2(data: Array[Byte]): Int = {
    val seed = 0x9747b28c
    val m = 0x5bd1e995
    val r = 24
    val length = data.length
    var h = seed ^ length
    val length4 = length / 4
    var i = 0
    while (i < length4) {
      val i4 = i * 4
      var k = (data(i4) & 0xff) |
        ((data(i4 + 1) & 0xff) << 8) |
        ((data(i4 + 2) & 0xff) << 16) |
        ((data(i4 + 3) & 0xff) << 24)
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
      case _ => ()
    }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }

  /** Keyed records follow Kafka's default partitioner exactly
    * (including EMPTY keys, which Kafka hashes like any other bytes);
    * a NULL key — which a real broker round-robins — is pinned to
    * partition 0 so replays stay deterministic (documented deviation).
    */
  def partitionFor(key: Array[Byte], nPartitions: Int): Int =
    if (key == null) 0
    else (murmur2(key) & 0x7fffffff) % nPartitions

  /** One persisted record. Key is null for unkeyed messages. */
  final case class Record(topic: String, key: Array[Byte],
                          value: Array[Byte], tsMs: Long)

  private val B64 = Base64.getEncoder
  private val B64D = Base64.getDecoder

  def encodeLine(r: Record): String = {
    require(r.topic.matches("[A-Za-z0-9._-]+"),
      s"illegal Kafka topic name: '${r.topic}'")
    val k = if (r.key == null) "-" else B64.encodeToString(r.key)
    s"${r.topic}\t$k\t${B64.encodeToString(r.value)}\t${r.tsMs}"
  }

  def decodeLine(line: String): Record = {
    val parts = line.split("\t", -1)
    require(parts.length == 4, s"corrupt testkafka record: '$line'")
    Record(parts(0),
      if (parts(1) == "-") null else B64D.decode(parts(1)),
      B64D.decode(parts(2)), parts(3).toLong)
  }

  /** Batch-commit record file names, ASCENDING in commit order (r15):
    * they were `records-<UUID>.tsv`, which sorts randomly — a second
    * `save()` into the same topic dir could sort BEFORE the first,
    * scrambling the seam's arrival-order semantics (offset ranks,
    * floors, the admission meters) across appends. A broker appends
    * at arrival; the name now carries (epoch-ms, process-wide
    * sequence, task partition), strictly monotonic within a JVM and
    * millisecond-ordered across them. Streaming epoch commits keep
    * their DETERMINISTIC `records-e<epoch>-p<part>` names (idempotent
    * re-commit needs them time-free); batch files ('b') sort before
    * epoch files ('e') — one writer kind per topic dir, as every
    * fixture does.
    */
  private val commitSeq = new java.util.concurrent.atomic.AtomicLong(0L)
  // The epoch-ms + sequence prefix is only unique per JVM (every
  // process's AtomicLong starts at 0): two processes appending to the
  // same topic dir in the same millisecond would collide and the
  // commit rename would silently overwrite the first file (r15
  // ADVICE — the replaced UUID names were collision-free). A fixed
  // per-process component after the sequence keeps names sortable
  // (ms-ordered across JVMs, seq-ordered within one) while making
  // cross-JVM collisions impossible again; %07d covers Linux's
  // default pid_max (4194304).
  private val processTag = f"${ProcessHandle.current().pid()}%07d"
  def nextBatchFileName(partitionId: Int): String =
    f"records-b${System.currentTimeMillis()}%013d-${commitSeq.getAndIncrement()}%06d-$processTag-p$partitionId.tsv"

  def listRecordFiles(path: String): Array[String] = {
    val dir = new File(path)
    Option(dir.listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isFile && f.getName.startsWith("records-"))
      .map(_.getAbsolutePath).sorted
  }

  /** Parse the real Kafka source's per-partition `startingOffsets`
    * offset JSON — `{"topic":{"0":23,"1":-2}}` — into per-(topic,
    * partition) starting-offset floors (r13 verdict item #4: mid-topic
    * resume is the commonest operational Kafka knob after
    * maxOffsetsPerTrigger, and the seam used to reject it outright).
    * `-2` means earliest, as in the real source. Two documented
    * deviations: `-1` (per-partition latest) is rejected — resolving
    * it needs broker end offsets, which at this seam are CONTENT
    * (record files must be read); use `startingOffsets=latest` for the
    * whole query instead — and (topic, partition)s absent from the
    * JSON start at earliest, where the real source demands every
    * TopicPartition be listed (the seam's topics live inside record
    * lines, so the full partition set is unknowable at planning time;
    * earliest matches the real source's newly-discovered-partition
    * rule).
    */
  def parseStartingOffsets(json: String, nPartitions: Int): Map[(String, Int), Long] =
    parseOffsetsJson(json, nPartitions, ending = false)

  /** `endingOffsets` twin for BATCH reads (r14): same JSON shape; the
    * sentinel rules flip — `-1` (latest) means unbounded here (the
    * batch read's natural end), `-2` (earliest) is rejected exactly as
    * the real source rejects it for ending offsets.
    */
  def parseEndingOffsets(json: String, nPartitions: Int): Map[(String, Int), Long] =
    parseOffsetsJson(json, nPartitions, ending = true)

  private def parseOffsetsJson(json: String, nPartitions: Int,
                               ending: Boolean): Map[(String, Int), Long] = {
    import org.json4s._
    val what = if (ending) "endingOffsets" else "startingOffsets"
    val parsed =
      try org.json4s.jackson.JsonMethods.parse(json)
      catch { case e: Exception => throw new IllegalArgumentException(
        s"testkafka: malformed $what JSON '$json'", e) }
    parsed match {
      case JObject(topics) if topics.nonEmpty =>
        topics.iterator.flatMap {
          case (topic, JObject(parts)) =>
            require(parts.nonEmpty,
              s"testkafka: $what topic '$topic' maps to an empty object")
            parts.iterator.map {
              case (p, JInt(n)) =>
                val pi =
                  try p.toInt
                  catch { case _: NumberFormatException =>
                    throw new IllegalArgumentException(
                      s"testkafka: $what partition '$p' of topic '$topic' is not an integer") }
                require(pi >= 0 && pi < nPartitions,
                  s"testkafka: $what names partition $pi of topic '$topic' " +
                    s"but the source has $nPartitions partitions")
                if (ending) {
                  require(n == -1 || n >= 0,
                    s"testkafka: $what $n for $topic-$pi — concrete offsets ≥0 and " +
                      "-1 (latest/unbounded) are supported; -2 (earliest) is not a " +
                      "valid ending offset, matching the real source")
                  ((topic, pi), if (n == -1) Long.MaxValue else n.toLong)
                } else {
                  require(n == -2 || n >= 0,
                    s"testkafka: $what $n for $topic-$pi — concrete offsets ≥0 " +
                      "and -2 (earliest) are supported; -1 (latest) needs broker end " +
                      "offsets, use startingOffsets=latest for the whole query")
                  ((topic, pi), if (n == -2) 0L else n.toLong)
                }
              case (p, other) => throw new IllegalArgumentException(
                s"testkafka: $what $topic-$p must be an integer offset, got $other")
            }
          case (topic, other) => throw new IllegalArgumentException(
            s"testkafka: $what topic '$topic' must map to " +
              s"""{"partition":offset}, got $other""")
        }.toMap
      case _ => throw new IllegalArgumentException(
        s"""testkafka: $what JSON must be {"topic":{"partition":offset}}, got '$json'""")
    }
  }
}

/** `format("graft-testkafka")` entry point (also registered as a
  * DataSourceRegister service so the short name resolves).
  */
class TestKafkaProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = TestKafka.ShortName
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TestKafka.ReadSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-testkafka requires a 'path' option"))
    val nPart = Option(properties.get("partitions")).map(_.toInt).getOrElse(4)
    val topic = Option(properties.get("topic"))
    new TestKafkaTable(path, nPart, topic)
  }
}

class TestKafkaTable(path: String, nPartitions: Int, defaultTopic: Option[String])
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"testkafka:$path"
  override def schema(): StructType = TestKafka.ReadSchema
  // ACCEPT_ANY_SCHEMA is what the real Kafka connector declares: the
  // sink takes the (key, value, topic[, timestamp]) producer shape,
  // not the 7-column read schema, so by-name write validation must be
  // skipped and the WriteBuilder enforces the sink contract itself.
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => {
      val starting = options.getOrDefault("startingOffsets", "earliest").trim
      // 'earliest' | 'latest' | per-partition offset JSON, the real
      // source's three forms. Anything else fails at planning time.
      val floors: Map[(String, Int), Long] =
        if (starting == "earliest" || starting == "latest") Map.empty
        else if (starting.startsWith("{"))
          TestKafka.parseStartingOffsets(starting, nPartitions)
        else throw new IllegalArgumentException(
          s"testkafka: startingOffsets must be 'earliest', 'latest' or " +
            s"""per-partition offset JSON {"topic":{"partition":offset}}, got '$starting'""")
      // `endingOffsets` — BATCH-only, like the real source: 'latest'
      // (default, unbounded) or per-partition JSON with -1 = latest.
      val ending = Option(options.get("endingOffsets")).map(_.trim)
      val ceilings: Map[(String, Int), Long] = ending match {
        case None | Some("latest") => Map.empty
        case Some(j) if j.startsWith("{") =>
          TestKafka.parseEndingOffsets(j, nPartitions)
        case Some(other) => throw new IllegalArgumentException(
          s"testkafka: endingOffsets must be 'latest' or per-partition offset " +
            s"JSON (earliest is not a valid ending offset), got '$other'")
      }
      // Topic targeting — the real source's subscribe / subscribePattern
      // (mutually exclusive). The seam's documented deviation: with
      // NEITHER set it reads every topic in the store (the real source
      // demands exactly one of assign/subscribe/subscribePattern).
      val subscribe = Option(options.get("subscribe"))
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      val pattern = Option(options.get("subscribePattern")).map(_.trim)
      require(subscribe.isEmpty || pattern.isEmpty,
        "testkafka: subscribe and subscribePattern are mutually exclusive, " +
          "matching the real source")
      pattern.foreach(p => java.util.regex.Pattern.compile(p)) // fail at planning
      new TestKafkaScan(path, nPartitions,
        // The real Kafka source's rate-limit option, same name & unit
        // (records per micro-batch).
        Option(options.getLong("maxOffsetsPerTrigger", -1L)).filter(_ > 0L),
        // The real source's ReadMinRows pair (r14 verdict item #5):
        // a trickle feed accumulates until `minOffsetsPerTrigger`
        // records are available OR `maxTriggerDelay` has passed since
        // the last fired batch — what stops a 100 TB lake's slow feed
        // from generating one micro-batch (and one output file) per
        // arriving record. Same names, same units, same 15m default.
        minPerTrigger =
          Option(options.getLong("minOffsetsPerTrigger", -1L)).filter(_ > 0L),
        maxTriggerDelayMs = org.apache.spark.network.util.JavaUtils
          .timeStringAsMs(Option(options.get("maxTriggerDelay")).getOrElse("15m")),
        // The real source's consumer-position option. NOTE the
        // deliberate DEFAULT deviation: the real streaming source
        // defaults to latest; this seam defaults to earliest because
        // replay fixtures stage their topic before consuming — a
        // latest default would silently drain nothing.
        startFromLatest = starting == "latest",
        floors = floors,
        ceilings = ceilings,
        endingSpecified = ending.exists(_ != "latest"),
        subscribe = subscribe,
        subscribePattern = pattern)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new TestKafkaWriteBuilder(path, defaultTopic, info)
}

// ---------------------------------------------------------------------
// Read path
// ---------------------------------------------------------------------

/** `prior` lines — (file, consumed-line-count) — have already been
  * consumed (streaming) or are empty (batch): they are COUNTED to
  * establish each topic's next offset, then the `delta` line ranges
  * — (file, fromLine, toLineExclusive) — are read and emitted.
  * Offsets are assigned in ARRIVAL order — sorted file name, then
  * line index — the Kafka semantic (offsets reflect append order,
  * not event time), dense per (topic, partition), and stable for a
  * given topic directory however the scan is split, rate-limited, or
  * resumed.
  *
  * `floors` — per-(topic, partition) starting offsets from the
  * `startingOffsets` offset JSON — suppress EMISSION of records whose
  * assigned offset is below the floor while still advancing the offset
  * counter past them: offsets stay log positions counting the skipped
  * history, exactly what a real consumer seeking to offset N observes.
  */
final case class TestKafkaInputPartition(partitionId: Int, nPartitions: Int,
                                         prior: Array[(String, Long)],
                                         delta: Array[(String, Long, Long)],
                                         floors: Map[(String, Int), Long] = Map.empty,
                                         ceilings: Map[(String, Int), Long] = Map.empty,
                                         subscribe: Option[Seq[String]] = None,
                                         subscribePattern: Option[String] = None)
    extends InputPartition

class TestKafkaScan(path: String, nPartitions: Int,
                    maxPerTrigger: Option[Long] = None,
                    minPerTrigger: Option[Long] = None,
                    maxTriggerDelayMs: Long = 15L * 60 * 1000,
                    startFromLatest: Boolean = false,
                    floors: Map[(String, Int), Long] = Map.empty,
                    ceilings: Map[(String, Int), Long] = Map.empty,
                    endingSpecified: Boolean = false,
                    subscribe: Option[Seq[String]] = None,
                    subscribePattern: Option[String] = None) extends Scan with Batch {
  override def readSchema(): StructType = TestKafka.ReadSchema
  override def toBatch: Batch = {
    // The real source's batch-read rule, verbatim: a batch query reads
    // a bounded range, and 'latest' names no bound.
    require(!startFromLatest,
      "testkafka: starting offset can't be latest for batch queries " +
        "(matching the Kafka source's rejection)")
    // minOffsetsPerTrigger is TRIGGER admission control — a batch
    // query has no trigger to defer, so the option can only be a
    // misconfiguration there. Fail loudly (streaming-only restriction,
    // negative-tested in KafkaAdmissionSpec).
    require(minPerTrigger.isEmpty,
      "testkafka: minOffsetsPerTrigger is a streaming-only admission " +
        "option (a batch read is bounded by endingOffsets, not triggers)")
    this
  }
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    // The real source's streaming rule, verbatim: an unbounded query
    // has no ending offset.
    require(!endingSpecified,
      "testkafka: ending offset not valid in streaming queries " +
        "(matching the Kafka source's rejection)")
    new TestKafkaMicroBatchStream(path, nPartitions, maxPerTrigger, startFromLatest,
      floors, subscribe, subscribePattern,
      minPerTrigger = minPerTrigger, maxTriggerDelayMs = maxTriggerDelayMs)
  }
  override def description(): String = s"TestKafkaScan(path=$path, partitions=$nPartitions)"

  override def planInputPartitions(): Array[InputPartition] = {
    val files = TestKafka.listRecordFiles(path)
      .map(f => (f, 0L, Long.MaxValue))
    (0 until nPartitions)
      .map(i => TestKafkaInputPartition(i, nPartitions, Array.empty, files,
        floors, ceilings, subscribe, subscribePattern): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    TestKafkaScan.readerFactory
}

object TestKafkaScan {
  val readerFactory: PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[TestKafkaInputPartition]
      new TestKafkaPartitionReader(p)
    }
}

class TestKafkaPartitionReader(p: TestKafkaInputPartition)
    extends PartitionReader[InternalRow] {
  // Topic targeting: subscribe list or pattern, applied BEFORE offset
  // assignment — excluding a whole topic never perturbs the offsets of
  // the topics that remain (offsets are per-topic by construction).
  private val topicOk: String => Boolean = (p.subscribe, p.subscribePattern) match {
    case (Some(list), _) => val set = list.toSet; set.contains _
    case (_, Some(pat)) => val rx = pat.r; t => rx.pattern.matcher(t).matches()
    case _ => _ => true
  }
  // Contract-test scale: each task reads the record files whole and
  // keeps only its partition's rows in its line range — fine for seam
  // tests, documented as wrong for TBs (TestKafka scaladoc).
  private def myRecords(ranges: Array[(String, Long, Long)]): Iterator[TestKafka.Record] =
    ranges.sortBy(_._1).iterator.flatMap { case (f, from, to) =>
      Files.readAllLines(Paths.get(f), StandardCharsets.UTF_8).asScala
        .iterator.zipWithIndex
        .collect { case (line, i) if i >= from && i < to && line.nonEmpty =>
          TestKafka.decodeLine(line)
        }
    }.filter(r => topicOk(r.topic) &&
      TestKafka.partitionFor(r.key, p.nPartitions) == p.partitionId)

  private val rows: Iterator[InternalRow] = {
    // Next offset per topic after the already-consumed prefix (full
    // files plus the rate-limited partial prefix of the newest one).
    val base = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    myRecords(p.prior.map { case (f, n) => (f, 0L, n) })
      .foreach(r => base(r.topic) += 1L)
    myRecords(p.delta).flatMap { r =>
      val offset = base(r.topic)
      base(r.topic) = offset + 1L
      // startingOffsets floor: records below it are consumed history —
      // they advance the log position but are never emitted, like a
      // consumer that sought past them. endingOffsets ceiling (batch):
      // records at/after it are beyond the read's bounded range.
      if (offset < p.floors.getOrElse((r.topic, p.partitionId), 0L) ||
          offset >= p.ceilings.getOrElse((r.topic, p.partitionId), Long.MaxValue)) None
      else Some(new GenericInternalRow(Array[Any](
        r.key, r.value, UTF8String.fromString(r.topic),
        p.partitionId, offset, r.tsMs * 1000L, 0)): InternalRow)
    }
  }
  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Streaming form of the scan — the S1 shape: each micro-batch
  * consumes the record lines that appeared since the last committed
  * offset, so `readStream.format("graft-testkafka")` behaves like the
  * Kafka source (incremental, checkpoint-resumable, exactly-once per
  * line). The offset maps each consumed record file to the number of
  * lines consumed from it — record granularity, so Kafka's
  * `maxOffsetsPerTrigger` admission contract is honorable exactly —
  * serialized as one sorted JSON object, tiny at seam-test scale.
  */
final case class TestKafkaOffset(lines: Seq[(String, Long)])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    lines.sortBy(_._1).map { case (f, n) =>
      "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\":" + n
    }.mkString("{", ",", "}")
}

object TestKafkaOffset {
  /** Exact inverse of [[TestKafkaOffset.json]] for ALL legal paths:
    * scans escaped string tokens character-by-character instead of
    * regex-splitting on `","`, which would mis-split a path containing
    * a literal quote-comma-quote sequence (json() escapes quotes and
    * backslashes, so the token scan below is unambiguous). Each key
    * token is followed by `:<count>`.
    */
  def fromJson(json: String): TestKafkaOffset = {
    // Format guard (r13 advice): a foreign or legacy checkpoint offset
    // (e.g. a pre-r13 JSON ARRAY of filenames) must fail loudly — the
    // token scan below would otherwise land its digit search inside
    // the next quoted filename and misparse (file, count) pairs.
    require(json.trim.startsWith("{"),
      s"testkafka offset: expected a {'file':count} JSON object, got '$json' — " +
        "foreign or legacy checkpoint?")
    val out = Seq.newBuilder[(String, Long)]
    var i = 0
    while (i < json.length && json.charAt(i) != '"') i += 1
    while (i < json.length) {
      // at an opening quote
      i += 1
      val sb = new StringBuilder
      var closed = false
      while (!closed) {
        require(i < json.length, s"testkafka offset: unterminated string in $json")
        json.charAt(i) match {
          case '\\' =>
            require(i + 1 < json.length,
              s"testkafka offset: dangling escape in $json")
            sb.append(json.charAt(i + 1)); i += 2
          case '"' => closed = true; i += 1
          case c => sb.append(c); i += 1
        }
      }
      while (i < json.length && !json.charAt(i).isDigit) i += 1
      val numStart = i
      while (i < json.length && json.charAt(i).isDigit) i += 1
      require(i > numStart, s"testkafka offset: missing line count in $json")
      out += (sb.result() -> json.substring(numStart, i).toLong)
      while (i < json.length && json.charAt(i) != '"') i += 1
    }
    TestKafkaOffset(out.result())
  }
}

/** Micro-batch stream with Kafka's ADMISSION-CONTROL contract: with no
  * `maxOffsetsPerTrigger` every batch takes all available records
  * (ReadAllAvailable — one batch per file-set change, the pre-r13
  * behavior); with it, `latestOffset(start, ReadLimit)` admits at most
  * that many records per micro-batch, consumed in arrival order
  * (sorted file, then line) at RECORD granularity — so an AvailableNow
  * drain executes ceil(total/max) real micro-batches against one
  * static topic directory, checkpoint-resumable mid-file. Kafka
  * rations the budget proportionally across topic-partitions; this
  * seam admits an arrival-order prefix instead (deterministic — a
  * replay fixture must not depend on rationing round-off), the same
  * observable ≤max-records-per-batch contract. SupportsTriggerAvailable
  * Now pins the run's end offset at start, as the real source does, so
  * files landing mid-drain don't extend it.
  *
  * `floors` (per-partition `startingOffsets` JSON) and the topic
  * filter compose with the budget EXACTLY as the real source's
  * seek-then-admit does (r14, closing the r14a documented deviation):
  * when either is set, `latestOffset` counts the budget over
  * ADMISSIBLE records only — subscribed topic, rank ≥ floor — by
  * walking memoized per-file admissibility prefix sums, so every
  * rate-limited batch emits exactly `max` rows until the feed's tail.
  * Pre-floor history and unsubscribed topics ride along inside the
  * admitted line ranges for free, as a seeking consumer never fetches
  * them. The prefix scan reads record files at the driver — seam-test
  * scale by design (the scaladoc's standing note), memoized on the
  * immutable sorted file list.
  */
class TestKafkaMicroBatchStream(path: String, nPartitions: Int,
                                maxPerTrigger: Option[Long] = None,
                                startFromLatest: Boolean = false,
                                floors: Map[(String, Int), Long] = Map.empty,
                                subscribe: Option[Seq[String]] = None,
                                subscribePattern: Option[String] = None,
                                minPerTrigger: Option[Long] = None,
                                maxTriggerDelayMs: Long = 15L * 60 * 1000,
                                clock: () => Long = () => System.currentTimeMillis())
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, ReadMinRows}

  // Record files are immutable once committed (atomic move; an epoch
  // re-commit replays identical content), so line counts memoize.
  private val lineCounts = scala.collection.concurrent.TrieMap.empty[String, Long]
  private def lineCount(f: String): Long =
    lineCounts.getOrElseUpdate(f, {
      val s = Files.lines(Paths.get(f), StandardCharsets.UTF_8)
      try s.count() finally s.close()
    })
  private def allAvailable(): Seq[(String, Long)] =
    TestKafka.listRecordFiles(path).toSeq.map(f => f -> lineCount(f))

  private val filtered =
    floors.nonEmpty || subscribe.isDefined || subscribePattern.isDefined
  private val topicOk: String => Boolean = (subscribe, subscribePattern) match {
    case (Some(list), _) => val set = list.toSet; set.contains _
    case (_, Some(pat)) => val rx = pat.r; t => rx.pattern.matcher(t).matches()
    case _ => _ => true
  }

  /** Per-file prefix sums of ADMISSIBLE records (subscribed topic and
    * per-(topic, partition) rank ≥ floor) over the sorted file list —
    * the driver-side map that lets the budget walk in latestOffset
    * count exactly what a post-seek consumer would fetch. Ranks
    * accumulate ACROSS files (arrival order), so the whole list
    * recomputes when it changes; files are immutable, so the memo is
    * sound.
    */
  @volatile private var admMemo: (Seq[String], Map[String, Array[Long]]) =
    (Nil, Map.empty)
  private def admissiblePrefixes(files: Seq[String]): Map[String, Array[Long]] = {
    val sorted = files.sorted
    val memo = admMemo
    if (memo._1 == sorted) return memo._2
    val ranks = scala.collection.mutable.Map.empty[(String, Int), Long]
      .withDefaultValue(0L)
    val out = sorted.map { f =>
      val lines = Files.readAllLines(Paths.get(f), StandardCharsets.UTF_8)
      val arr = new Array[Long](lines.size() + 1)
      var adm = 0L
      var i = 0
      while (i < lines.size()) {
        val line = lines.get(i)
        if (line.nonEmpty) {
          val r = TestKafka.decodeLine(line)
          val key = (r.topic, TestKafka.partitionFor(r.key, nPartitions))
          val rank = ranks(key)
          ranks(key) = rank + 1L
          if (topicOk(r.topic) && rank >= floors.getOrElse(key, 0L)) adm += 1L
        }
        arr(i + 1) = adm
        i += 1
      }
      f -> arr
    }.toMap
    admMemo = (sorted, out)
    out
  }

  @volatile private var availableNowTarget: Option[Seq[(String, Long)]] = None
  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowTarget = Some(allAvailable())
  }

  /** The real source's limit composition, verbatim: min+max →
    * CompositeReadLimit(ReadMinRows, ReadMaxRows); min alone →
    * ReadMinRows; max alone → ReadMaxRows; neither → all-available.
    */
  override def getDefaultReadLimit: ReadLimit = (minPerTrigger, maxPerTrigger) match {
    case (Some(min), Some(max)) => ReadLimit.compositeLimit(Array(
      ReadLimit.minRows(min, maxTriggerDelayMs), ReadLimit.maxRows(max)))
    case (Some(min), None) => ReadLimit.minRows(min, maxTriggerDelayMs)
    case (None, Some(max)) => ReadLimit.maxRows(max)
    case _ => ReadLimit.allAvailable()
  }

  /** Wall-clock of the last FIRED (non-deferred) micro-batch, for the
    * ReadMinRows deadline. 0 initial = the first trigger always fires
    * regardless of min — the real source's exact rule (its
    * lastTriggerMillis also starts at 0, so the first delayBatch call
    * sees the deadline as passed).
    */
  @volatile private var lastTriggerMillis = 0L

  /** ReadMinRows deferral (the real source's delayBatch, same
    * decision order): deadline passed → fire; else NEW admissible
    * records since `start` < min → defer; else fire. Both fire paths
    * reset the deadline clock.
    */
  private def delayBatch(min: Long, target: Seq[(String, Long)],
                         startMap: Map[String, Long]): Boolean = {
    val now = clock()
    if (now - lastTriggerMillis >= maxTriggerDelayMs) {
      lastTriggerMillis = now
      false
    } else {
      val newRecords =
        if (filtered) {
          val pref = admissiblePrefixes(target.map(_._1))
          target.map { case (f, n) =>
            val arr = pref(f)
            arr(n.toInt) - arr(math.min(startMap.getOrElse(f, 0L), n).toInt)
          }.sum
        } else target.map { case (f, n) =>
          n - math.min(startMap.getOrElse(f, 0L), n)
        }.sum
      if (newRecords < min) true
      else { lastTriggerMillis = now; false }
    }
  }

  /** `startingOffsets=latest` — Kafka's consumer-position semantics:
    * a FRESH query (no checkpoint) starts at the log's current end and
    * sees only records produced after it started; offsets stay log
    * positions (they keep counting the skipped history), exactly as a
    * real consumer seeking to the end would observe. A checkpointed
    * restart never consults this — initialOffset is only called when
    * no offset log exists.
    */
  override def initialOffset(): Offset =
    if (startFromLatest) TestKafkaOffset(allAvailable()) else TestKafkaOffset(Nil)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val target = availableNowTarget.getOrElse(allAvailable()).sortBy(_._1)
    val startMap = start.asInstanceOf[TestKafkaOffset].lines.toMap
    // Unwrap the composite exactly as the real source does: all-
    // available wins outright; otherwise ReadMinRows (deferral) is
    // consulted FIRST, then ReadMaxRows rations what fires. Note the
    // real source's corner, mirrored deliberately: with min+max set,
    // a tail smaller than min left behind by the max cap DEFERS until
    // the deadline even though the feed already delivered it once —
    // pinned in KafkaAdmissionSpec.
    val limits = limit match {
      case c: CompositeReadLimit => c.getReadLimits.toSeq
      case l => Seq(l)
    }
    limits.collectFirst {
      case l if !l.isInstanceOf[ReadAllAvailable] &&
        !l.isInstanceOf[ReadMinRows] && !l.isInstanceOf[ReadMaxRows] =>
        throw new UnsupportedOperationException(
          s"testkafka: unsupported read limit $l")
    }
    if (limits.exists(_.isInstanceOf[ReadAllAvailable]))
      return TestKafkaOffset(target)
    limits.collectFirst { case m: ReadMinRows => m }.foreach { m =>
      if (delayBatch(m.minRows(), target, startMap))
        return TestKafkaOffset(
          target.map { case (f, n) => f -> math.min(startMap.getOrElse(f, 0L), n) })
    }
    limits.collectFirst { case r: ReadMaxRows => r } match {
      case Some(r) if filtered =>
        // Seek-then-admit: budget counts ADMISSIBLE records only, so
        // every batch is exactly `max` rows until the feed's tail —
        // inadmissible lines inside the admitted ranges are free.
        val pref = admissiblePrefixes(target.map(_._1))
        var budget = r.maxRows()
        TestKafkaOffset(target.map { case (f, n) =>
          val arr = pref(f)
          val done = math.min(startMap.getOrElse(f, 0L), n)
          val admRemaining = arr(n.toInt) - arr(done.toInt)
          if (admRemaining <= budget) { budget -= admRemaining; f -> n }
          else {
            val targetAdm = arr(done.toInt) + budget
            var t = done.toInt
            while (arr(t) < targetAdm) t += 1
            budget = 0L
            f -> t.toLong
          }
        })
      case Some(r) =>
        var budget = r.maxRows()
        TestKafkaOffset(target.map { case (f, n) =>
          val done = math.min(startMap.getOrElse(f, 0L), n)
          val take = math.max(0L, math.min(n - done, budget))
          budget -= take
          f -> (done + take)
        })
      case None =>
        // ReadMinRows alone: once the batch fires it takes everything
        // available (the real source's min-without-max behavior).
        TestKafkaOffset(target)
    }
  }
  override def deserializeOffset(json: String): Offset = TestKafkaOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val prior = start.asInstanceOf[TestKafkaOffset].lines.toArray
    val priorMap = prior.toMap
    val delta = end.asInstanceOf[TestKafkaOffset].lines.toArray.sortBy(_._1)
      .map { case (f, n) => (f, priorMap.getOrElse(f, 0L), n) }
      .filter { case (_, from, to) => to > from }
    (0 until nPartitions)
      .map(i => TestKafkaInputPartition(i, nPartitions, prior, delta, floors,
        Map.empty, subscribe, subscribePattern): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    TestKafkaScan.readerFactory
}

// ---------------------------------------------------------------------
// Write path
// ---------------------------------------------------------------------

class TestKafkaWriteBuilder(path: String, defaultTopic: Option[String],
                            info: LogicalWriteInfo) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new TestKafkaBatchWrite(path, defaultTopic, info.schema())
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new TestKafkaStreamingWrite(path, defaultTopic, info.schema())
  }
}

/** Streaming form of the sink — the K3 shape: `writeStream
  * .format("graft-testkafka")` appends each epoch's records as one
  * committed record file per task, the same contract checks and
  * atomic tmp-file move as the batch write. Committed file names
  * derive from (epochId, partitionId) — never a UUID — so an epoch
  * replayed after a crash-between-commit-and-checkpoint overwrites
  * its own earlier files instead of duplicating them: exactly-once
  * output under BOTH clean restart and the commit/checkpoint race,
  * by idempotent re-commit rather than transactions (KafkaSeamSpec
  * round-trips the clean path and re-commits an epoch directly).
  */
class TestKafkaStreamingWrite(path: String, defaultTopic: Option[String],
                              schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  // Reuse the batch write's planning-time contract checks and its
  // commit/abort file choreography verbatim.
  private val batch = new TestKafkaBatchWrite(path, defaultTopic, schema)

  override def createStreamingWriterFactory(info: PhysicalWriteInfo):
      org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    TestKafkaStreamingWriterFactory(path, defaultTopic, schema)

  // Destination names derive from (epochId, partitionId), NOT a fresh
  // UUID: if the engine crashes after this move but before the
  // checkpoint records the batch, the replayed epoch re-commits over
  // its own files instead of appending duplicates — the file-move
  // sink's classic at-least-once corner, closed by idempotent naming.
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    batch.commitAs(messages,
      m => s"records-e$epochId-p${m.partitionId}.tsv")
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    batch.abort(messages)
}

final case class TestKafkaCommit(tmpFile: String, partitionId: Int)
    extends WriterCommitMessage

class TestKafkaBatchWrite(path: String, defaultTopic: Option[String],
                          schema: StructType) extends BatchWrite {
  // Kafka sink contract checks, at planning time: value required,
  // key/topic optional, strings acceptable where bytes are.
  private def fieldIdx(name: String): Int = schema.fieldNames.indexOf(name)
  require(fieldIdx("value") >= 0, "testkafka sink requires a 'value' column")
  require({
    val t = schema(fieldIdx("value")).dataType
    t == BinaryType || t == StringType
  }, "'value' must be BINARY or STRING")
  require(fieldIdx("topic") >= 0 || defaultTopic.isDefined,
    "testkafka sink needs a 'topic' column or a 'topic' option")
  require(fieldIdx("topic") < 0 ||
    schema(fieldIdx("topic")).dataType == StringType,
    "'topic' must be STRING")
  require(fieldIdx("key") < 0 || {
    val t = schema(fieldIdx("key")).dataType
    t == BinaryType || t == StringType
  }, "'key' must be BINARY or STRING")
  require(fieldIdx("timestamp") < 0 || {
    val t = schema(fieldIdx("timestamp")).dataType
    t == TimestampType || t == LongType
  }, "'timestamp' must be TIMESTAMP (micros) or BIGINT (epoch-ms)")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new TestKafkaWriterFactory(path, defaultTopic, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    commitAs(messages, m => TestKafka.nextBatchFileName(m.partitionId))

  /** Move each task's tmp file to its committed name. `name` picks the
    * destination from the commit message: batch commits use a fresh
    * UUID (each batch write appends); the streaming epoch commit
    * derives the name from (epochId, partitionId), so a replayed
    * epoch — crash after commit moved the files but before the
    * checkpoint recorded the batch — OVERWRITES its own earlier
    * output instead of duplicating it (idempotent epoch re-commit).
    */
  private[sources] def commitAs(messages: Array[WriterCommitMessage],
                                name: TestKafkaCommit => String): Unit = {
    new File(path).mkdirs()
    messages.foreach {
      case m @ TestKafkaCommit(tmp, _) if tmp.nonEmpty =>
        val src = Paths.get(tmp)
        if (Files.exists(src)) {
          Files.move(src, Paths.get(path, name(m)),
            StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        }
      case _ => ()
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case TestKafkaCommit(tmp, _) => Files.deleteIfExists(Paths.get(tmp)); ()
      case _ => ()
    }
}

/** Ships to executors — a case class of plain values, nothing from the
  * driver-side Write captured (it is not Serializable).
  */
final case class TestKafkaStreamingWriterFactory(path: String, defaultTopic: Option[String],
                                                 schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new TestKafkaDataWriter(path, defaultTopic, schema, partitionId, taskId)
}

class TestKafkaWriterFactory(path: String, defaultTopic: Option[String],
                             schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new TestKafkaDataWriter(path, defaultTopic, schema, partitionId, taskId)
}

class TestKafkaDataWriter(path: String, defaultTopic: Option[String],
                          schema: StructType, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val keyIdx = schema.fieldNames.indexOf("key")
  private val valueIdx = schema.fieldNames.indexOf("value")
  private val topicIdx = schema.fieldNames.indexOf("topic")
  private val tsIdx = schema.fieldNames.indexOf("timestamp")
  private def bytesAt(row: InternalRow, idx: Int): Array[Byte] =
    if (idx < 0 || row.isNullAt(idx)) null
    else schema(idx).dataType match {
      case BinaryType => row.getBinary(idx)
      case StringType => row.getUTF8String(idx).toString.getBytes(StandardCharsets.UTF_8)
      case t => throw new IllegalArgumentException(
        s"testkafka: column ${schema(idx).name} has unsupported type $t")
    }

  private val tmp = {
    new File(path).mkdirs()
    Paths.get(path, s".tmp-$partitionId-$taskId-${UUID.randomUUID()}")
  }
  private lazy val out = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)
  private var wroteAny = false

  override def write(row: InternalRow): Unit = {
    val value = bytesAt(row, valueIdx)
    require(value != null, "testkafka: null 'value' (Kafka tombstones unsupported here)")
    val topic =
      if (topicIdx >= 0 && !row.isNullAt(topicIdx)) row.getUTF8String(topicIdx).toString
      else defaultTopic.getOrElse(
        throw new IllegalArgumentException("testkafka: null topic and no 'topic' option"))
    // Deterministic default timestamp (0): a broker stamps arrival
    // time; a replay fixture must not depend on the wall clock.
    // TimestampType rows carry micros (÷1000 → ms); a LongType column
    // is taken as epoch-ms verbatim — validated at planning time, so
    // no silent 1000× shrink for ms-typed longs.
    val tsMs =
      if (tsIdx < 0 || row.isNullAt(tsIdx)) 0L
      else schema(tsIdx).dataType match {
        case TimestampType => row.getLong(tsIdx) / 1000L
        case _ => row.getLong(tsIdx)
      }
    out.write(TestKafka.encodeLine(
      TestKafka.Record(topic, bytesAt(row, keyIdx), value, tsMs)))
    out.write("\n")
    wroteAny = true
  }

  override def commit(): WriterCommitMessage = {
    if (wroteAny) out.close() else Files.deleteIfExists(tmp)
    TestKafkaCommit(if (wroteAny) tmp.toString else "", partitionId)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: Throwable => () }
    Files.deleteIfExists(tmp)
    ()
  }

  override def close(): Unit = ()
}

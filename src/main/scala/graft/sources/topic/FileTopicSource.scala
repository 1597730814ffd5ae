package graft.sources.topic

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * Kafka-SHAPED micro-batch source over a file-backed topic — the binding
 * for the reference's declared Kafka roadmap item (README.md:115-120),
 * with the broker replaced by the only transport available offline: an
 * append-only directory tree. The offset MODEL is Kafka's, exactly:
 *
 *   - a topic is a set of numbered partitions (`<path>/p=<N>/`);
 *   - a partition is an ordered, append-only record log (here: `*.jsonl`
 *     segment files, lexicographic file order = commit order, one record
 *     per line — Kafka's own segment layout);
 *   - a stream offset is a per-partition map of next-record positions,
 *     checkpointed as JSON (`{"0":12,"1":7}`) like Kafka's
 *     `{topicPartition: offset}` map;
 *   - each micro-batch covers `[start(p), end(p))` per partition, with
 *     ONE reader per topic-partition (Kafka's parallelism contract:
 *     within-partition order is preserved, cross-partition order is not);
 *   - new partitions appearing between triggers are picked up at the
 *     next `latestOffset` with start position 0 (partition expansion).
 *
 * Output schema mirrors the Kafka connector's essentials:
 * `partition INT, offset BIGINT, value STRING`. Swapping this binding
 * for a real broker changes segment listing/reading into consumer
 * fetches; the offset bookkeeping, restart semantics, and downstream
 * pipeline (`[[graft.streaming.Streams]]` sinks) are unchanged.
 *
 * Batch reads (`spark.read.format(...)`) scan every partition from 0 to
 * its current end — the `startingOffsets=earliest, endingOffsets=latest`
 * shape.
 *
 * Options: `path` (required; also accepted via `.load(path)`).
 */
class FileTopicSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FileTopicSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FileTopicTable(properties.asScala.toMap)
}

object FileTopicSource {
  val schema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("value", StringType)))

  /** Partition ids present under the topic path (empty if absent). */
  def partitions(path: String): Seq[Int] = {
    val dir = new java.io.File(path)
    if (!dir.isDirectory) Seq.empty
    else dir.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("p="))
      .map(_.getName.stripPrefix("p=").toInt).sorted
  }

  /** Segment files of a partition in commit (lexicographic) order. */
  def segments(path: String, partition: Int): Seq[java.io.File] = {
    val dir = new java.io.File(path, s"p=$partition")
    if (!dir.isDirectory) Seq.empty
    else dir.listFiles().toSeq.filter(f =>
      f.isFile && f.getName.endsWith(".jsonl")).sortBy(_.getName)
  }

  private def countLines(f: java.io.File): Long = {
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.getLines().size.toLong finally src.close()
  }

  /** Next offset (= record count so far) of a partition. */
  def endOffset(path: String, partition: Int): Long =
    segments(path, partition).map(countLines).sum

  /** Test/simulator producer: append `records` to partition `partition`
   * as one new segment file. Segment names are zero-padded sequence
   * numbers so lexicographic order is append order. */
  def append(path: String, partition: Int, records: Seq[String]): Unit = {
    val dir = new java.io.File(path, s"p=$partition")
    dir.mkdirs()
    val seq = segments(path, partition).size
    val f = new java.io.File(dir, f"$seq%09d.jsonl")
    val w = new java.io.PrintWriter(f, "UTF-8")
    try records.foreach(w.println) finally w.close()
  }
}

/** Per-partition next-record positions, JSON `{"pid":offset}`. */
case class TopicOffset(positions: Map[Int, Long]) extends Offset {
  override def json(): String =
    positions.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

object TopicOffset {
  def parse(json: String): TopicOffset = TopicOffset(
    json.stripPrefix("{").stripSuffix("}").split(",").toSeq
      .filter(_.nonEmpty)
      .map { kv =>
        val Array(k, v) = kv.split(":")
        k.trim.stripPrefix("\"").stripSuffix("\"").toInt -> v.trim.toLong
      }.toMap)
}

private[topic] class FileTopicTable(properties: Map[String, String])
    extends Table with SupportsRead {
  private val path = properties.getOrElse("path",
    throw new IllegalArgumentException("file-topic source requires a path"))
  override def name(): String = s"file-topic($path)"
  override def schema(): StructType = FileTopicSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new FileTopicScan(path)
}

private[topic] class FileTopicScan(path: String) extends Scan {
  override def readSchema(): StructType = FileTopicSource.schema

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      FileTopicSource.partitions(path).map { p =>
        TopicRange(path, p, 0L, FileTopicSource.endOffset(path, p)): InputPartition
      }.toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new TopicReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FileTopicMicroBatch(path)
}

private[topic] class FileTopicMicroBatch(path: String)
    extends MicroBatchStream {
  override def initialOffset(): Offset =
    TopicOffset(FileTopicSource.partitions(path).map(_ -> 0L).toMap)
  override def deserializeOffset(json: String): Offset = TopicOffset.parse(json)

  override def latestOffset(): Offset =
    TopicOffset(FileTopicSource.partitions(path)
      .map(p => p -> FileTopicSource.endOffset(path, p)).toMap)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TopicOffset].positions
    val e = end.asInstanceOf[TopicOffset].positions
    e.toSeq.sortBy(_._1).flatMap { case (p, endOff) =>
      val startOff = s.getOrElse(p, 0L) // new partition -> from 0
      if (endOff > startOff) Some(TopicRange(path, p, startOff, endOff): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TopicReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[topic] case class TopicRange(path: String, partition: Int,
                                     start: Long, end: Long)
    extends InputPartition

private[topic] class TopicReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[TopicRange]
    new TopicRangeReader(r)
  }
}

/** Emits records [start, end) of one topic-partition in log order. */
private[topic] class TopicRangeReader(r: TopicRange)
    extends PartitionReader[InternalRow] {
  private val files = FileTopicSource.segments(r.path, r.partition).iterator
  private var lines: Iterator[String] = Iterator.empty
  private var src: scala.io.Source = _
  private var pos = 0L
  private var current: String = _

  override def next(): Boolean = {
    while (pos < r.end) {
      if (lines.hasNext) {
        val line = lines.next()
        pos += 1
        if (pos > r.start) { current = line; return true }
      } else if (files.hasNext) {
        if (src != null) src.close()
        src = scala.io.Source.fromFile(files.next(), "UTF-8")
        lines = src.getLines()
      } else return false
    }
    false
  }

  override def get(): InternalRow =
    InternalRow(r.partition, pos - 1, UTF8String.fromString(current))

  override def close(): Unit = if (src != null) src.close()
}

package graft.sources.topic

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FileTopicSpec extends SparkSpec {

  test("batch read: every partition from offset 0, log order per partition") {
    val topic = Files.createTempDirectory("topic-batch").toString
    FileTopicSource.append(topic, 0, Seq("""{"id":1}""", """{"id":2}"""))
    FileTopicSource.append(topic, 1, Seq("""{"id":10}"""))
    FileTopicSource.append(topic, 0, Seq("""{"id":3}""")) // second segment
    val out = rows(spark.read.format(classOf[FileTopicSource].getName)
      .option("path", topic).load()
      .select(col("partition"), col("offset"),
        get_json_object(col("value"), "$.id").cast("long").as("id"))
      .orderBy("partition", "offset"))
    assert(out == Seq(
      Seq(0, 0L, 1L), Seq(0, 1L, 2L), Seq(0, 2L, 3L), Seq(1, 0L, 10L)))
  }

  test("micro-batch stream: per-partition offsets, checkpoint restart, " +
      "partition expansion — records arrive exactly once") {
    val topic = Files.createTempDirectory("topic-stream").toString
    val cp = Files.createTempDirectory("topic-cp").toString
    val out = Files.createTempDirectory("topic-out").toString
    FileTopicSource.append(topic, 0, Seq("""{"id":1}""", """{"id":2}"""))
    FileTopicSource.append(topic, 1, Seq("""{"id":3}"""))
    def start() = spark.readStream
      .format(classOf[FileTopicSource].getName)
      .option("path", topic).load()
      .select(col("partition"), col("offset"),
        get_json_object(col("value"), "$.id").cast("long").as("id"))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).outputMode("append").start()
    def ids() = rows(spark.read.parquet(out).orderBy("id"))
      .map(_(2)).asInstanceOf[Seq[Long]]
    val q = start()
    try {
      q.processAllAvailable()
      assert(ids() == (1L to 3L))
    } finally q.stop()
    // append to both partitions AND expand with a brand-new partition;
    // the restarted query resumes from the checkpointed per-partition
    // offsets (1-3 not re-emitted) and picks p=2 up from position 0
    FileTopicSource.append(topic, 0, Seq("""{"id":4}"""))
    FileTopicSource.append(topic, 1, Seq("""{"id":5}""", """{"id":6}"""))
    FileTopicSource.append(topic, 2, Seq("""{"id":7}"""))
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(ids() == (1L to 7L))
      // within-partition offsets stay contiguous after the restart
      val p1 = rows(spark.read.parquet(out)
        .filter(col("partition") === 1).orderBy("offset"))
        .map(r => (r(1), r(2)))
      assert(p1 == Seq((0L, 3L), (1L, 5L), (2L, 6L)))
    } finally q2.stop()
  }

  test("end-to-end: topic -> parse -> upsert sink (the reference's " +
      "Kafka-to-warehouse roadmap shape), exactly-once across restart") {
    val topic = Files.createTempDirectory("topic-e2e").toString
    val cp = Files.createTempDirectory("topic-e2e-cp").toString
    graft.tables.Tables.dropTable(spark, "topic_deals")
    def rec(id: Long, v: Double, ts: String) =
      s"""{"id":$id,"value":$v,"ts":"$ts"}"""
    FileTopicSource.append(topic, 0, Seq(
      rec(1, 10.0, "2024-01-01 00:00:00"), rec(2, 20.0, "2024-01-01 00:01:00")))
    FileTopicSource.append(topic, 1, Seq(
      rec(1, 11.0, "2024-01-02 00:00:00"))) // newer version of id 1
    def start() = {
      val parsed = spark.readStream
        .format(classOf[FileTopicSource].getName)
        .option("path", topic).load()
        .select(
          get_json_object(col("value"), "$.id").cast("long").as("id"),
          get_json_object(col("value"), "$.value").cast("double").as("v"),
          get_json_object(col("value"), "$.ts").cast("timestamp").as("ts"))
      graft.streaming.Streams.upsertSink(parsed, "topic_deals", "id", "ts", cp)
    }
    val q = start()
    try {
      q.processAllAvailable()
      // id 1 deduped to its newest version across partitions
      assert(rows(spark.table("topic_deals").orderBy("id"))
        .map(r => (r(0), r(1))) == Seq((1L, 11.0), (2L, 20.0)))
    } finally q.stop()
    // produce an update + an insert; the restarted stream must not
    // re-apply the already-consumed records
    FileTopicSource.append(topic, 0, Seq(
      rec(2, 25.0, "2024-01-03 00:00:00"), rec(3, 30.0, "2024-01-03 00:01:00")))
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(rows(spark.table("topic_deals").orderBy("id"))
        .map(r => (r(0), r(1))) == Seq((1L, 11.0), (2L, 25.0), (3L, 30.0)))
    } finally q2.stop()
    graft.tables.Tables.dropTable(spark, "topic_deals")
  }

  test("TopicOffset JSON round-trips") {
    val o = TopicOffset(Map(0 -> 12L, 1 -> 7L, 10 -> 0L))
    assert(TopicOffset.parse(o.json()) == o)
    assert(TopicOffset.parse("{}") == TopicOffset(Map.empty))
  }
}

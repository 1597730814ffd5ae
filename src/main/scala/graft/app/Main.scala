package graft.app

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Relational
import graft.schema.Normalize
import graft.sources.rest.RestIngest
import graft.tables.Tables

/**
 * CLI pipeline runner — the reference's Tkinter orchestration re-expressed
 * as subcommands (reference: omnichannel_to_bq.py:203-311; SURVEY.md
 * §2.11 C1-C6; the CLI form is the reference's own roadmap, README.md:119).
 *
 *   load   --input <parquet dir|json url template> --table T
 *          [--since ISO --to ISO] [--ts-col created_at] [--preview]
 *   upsert ... --key id --staging S
 *
 * Flow (new/update paths, omnichannel_to_bq.py:233-304): fetch -> normalize
 * -> sort -> optional preview -> abort-on-empty -> overwrite-load | staged
 * upsert (staging table -> merge -> drop staging, with drop in a finally so
 * a failed merge still cleans up — reference :189-191).
 */
object Main {

  case class Config(action: String = "", input: String = "", table: String = "",
                    key: String = "id", staging: String = "",
                    since: Option[String] = None, to: Option[String] = None,
                    tsCol: String = "created_at", preview: Boolean = false,
                    objKey: String = "deals", partitionByDate: Boolean = false)

  /** ISO input parsing at the app boundary (reference get_iso_from_input,
   * omnichannel_to_bq.py:15-26): accepts `yyyy-MM-dd` or
   * `yyyy-MM-dd HH:mm:ss`, canonicalizes to the latter. */
  def parseIso(s: String): String = {
    val t = s.trim
    val dt =
      if (t.length == 10) LocalDateTime.parse(t + " 00:00:00",
        DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      else LocalDateTime.parse(t.replace('T', ' '),
        DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    dt.format(DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
  }

  def parseArgs(args: Seq[String]): Config = {
    require(args.nonEmpty && Set("load", "upsert").contains(args.head),
      "usage: load|upsert --input <src> --table <name> [options]")
    var c = Config(action = args.head)
    var rest = args.tail.toList
    while (rest.nonEmpty) rest match {
      case "--input" :: v :: t   => c = c.copy(input = v.trim); rest = t
      case "--table" :: v :: t   => c = c.copy(table = v.trim); rest = t // F8 .trim
      case "--key" :: v :: t     => c = c.copy(key = v.trim); rest = t
      case "--staging" :: v :: t => c = c.copy(staging = v.trim); rest = t
      case "--since" :: v :: t   => c = c.copy(since = Some(parseIso(v))); rest = t
      case "--to" :: v :: t      => c = c.copy(to = Some(parseIso(v))); rest = t
      case "--ts-col" :: v :: t  => c = c.copy(tsCol = v.trim); rest = t
      case "--obj-key" :: v :: t => c = c.copy(objKey = v.trim); rest = t
      case "--preview" :: t      => c = c.copy(preview = true); rest = t
      case "--partition-by-date" :: t =>
        c = c.copy(partitionByDate = true); rest = t
      case other :: _ =>
        throw new IllegalArgumentException(s"unknown argument: $other")
      case Nil => ()
    }
    require(c.input.nonEmpty, "--input is required")
    require(c.table.nonEmpty, "--table is required")
    if (c.action == "upsert" && c.staging.isEmpty)
      c = c.copy(staging = c.table + "_staging")
    c
  }

  /** Fetch stage: JSON URL templates go through the paginated DSv2 source
   * (+ JSON materialization); anything else is read as parquet. */
  def fetch(spark: SparkSession, c: Config): DataFrame = {
    val fetched =
      if (c.input.contains("{page}"))
        RestIngest.readJson(spark, Map("url" -> c.input, "objKey" -> c.objKey,
          "tsField" -> c.tsCol) ++
          c.since.map("since" -> _) ++ c.to.map("to" -> _))
      else {
        val df0 = spark.read.parquet(c.input)
        // TIMESTAMP(NANOS) parquet columns surface as BIGINT under the
        // nanosAsLong session conf — convert to a real timestamp so the
        // time-range literals compare as timestamps, not longs
        val df =
          if (df0.columns.contains(c.tsCol) &&
              df0.schema(c.tsCol).dataType == org.apache.spark.sql.types.LongType)
            df0.withColumn(c.tsCol,
              org.apache.spark.sql.functions.expr(s"timestamp_micros(`${c.tsCol}` div 1000)"))
          else df0
        (c.since, c.to) match {
          case (Some(s), Some(t)) if df.columns.contains(c.tsCol) =>
            Relational.timeRange(df, c.tsCol, s, t)
          case _ => df
        }
      }
    fetched
  }

  /** Runs the pipeline; returns the final row count. Throws on failure;
   * returns -1 on abort-on-empty (reference :243-244 shows a dialog and
   * stops before any table is touched). */
  def run(spark: SparkSession, c: Config): Long = {
    val df = Relational.sortByCreatedAt(
      Normalize.normalize(fetch(spark, c)), c.tsCol)
    if (df.isEmpty) {
      System.err.println(s"[graft] no data fetched for range " +
        s"[${c.since.getOrElse("-inf")}, ${c.to.getOrElse("+inf")}) — aborting")
      return -1L
    }
    if (c.preview) df.show(5, truncate = false)
    c.action match {
      case "load" =>
        if (c.partitionByDate && df.columns.contains(c.tsCol)) {
          // date-partitioned lakehouse layout: later [since, to) loads
          // replace only the dates present in the batch (dynamic
          // overwrite) and dt filters prune at the scan
          val dt = org.apache.spark.sql.functions
            .substring(org.apache.spark.sql.functions.col(c.tsCol), 1, 10)
          Tables.loadPartitioned(df.withColumn("dt", dt), c.table, "dt")
        } else Tables.loadOverwrite(df, c.table)
        spark.table(c.table).count()
      case "upsert" =>
        // restart hygiene: if a previous run crashed mid-swap, restore the
        // main table from tmp/backup BEFORE staging a new merge
        if (Tables.recoverSwap(spark, c.table))
          System.err.println(
            s"[graft] recovered ${c.table} from an interrupted swap")
        // reference update path: stage, merge, drop staging even on failure
        Tables.loadOverwrite(df, c.staging)
        try {
          // the reference prints its generated MERGE before running it
          // (omnichannel_to_bq.py:183) — same artifact here in the
          // reference's literal bare-identifier shape; an online
          // deployment should ship mergeSqlText's default QUOTED form
          println("[graft] merge SQL:\n" +
            Tables.mergeSqlText(spark, c.staging, c.table, c.key,
              quoteIdentifiers = false))
          Tables.upsertIntoTable(spark, spark.table(c.staging), c.table,
            c.key)
        } finally Tables.dropTable(spark, c.staging)
    }
  }

  def main(args: Array[String]): Unit = {
    val c =
      try parseArgs(args.toSeq)
      catch { case e: IllegalArgumentException =>
        System.err.println(s"[graft] ${e.getMessage}")
        sys.exit(2)
      }
    val spark = graft.GraftSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = run(spark, c)
    if (n >= 0) println(s"[graft] ${c.action} into '${c.table}' complete; " +
      s"COUNT(*) = $n")
    spark.stop()
    if (n < 0) sys.exit(1)
  }
}

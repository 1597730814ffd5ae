package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * JSONL (newline-delimited JSON) source/sink — the de-facto interchange
 * format for LLM training corpora (one document object per line).
 * Spark's json reader is line-delimited by default, so both directions
 * are the built-in codegen'd scan/sink with the interchange conventions
 * pinned: single-line records, absent-for-null on write.
 *
 * Scale: JSONL is newline-splittable, so reads parallelize per file
 * split like CSV/parquet; writes emit one shard per partition —
 * `repartition(n)` upstream chooses shard count and size. Pass an
 * explicit schema when reading at scale: schema inference is a full
 * extra pass over the data and is only acceptable on samples.
 */
object Jsonl {

  /** Write `df` as JSONL, omitting null fields (consumers treat absent
   * and null keys identically; dropping them keeps shard bytes down). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("ignoreNullFields", "true")
      .json(path)

  /** Read JSONL with an explicit schema (the scale path — no inference
   * pass; fields absent from a line surface as nulls). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Read JSONL with schema inference — sample/exploration path only:
   * inference costs a full extra scan before the real one. */
  def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /**
   * Read JSONL splitting good rows from a quarantine channel: lines that
   * fail to parse (or whose fields fail the schema) surface on the
   * second frame with the raw line intact, instead of aborting the job
   * (FAILFAST) or silently nulling out (plain PERMISSIVE). A crawl-scale
   * ingest ALWAYS contains malformed shards; the pipeline contract is
   * "load the good, keep the bad inspectable".
   *
   * Shape: a line-splittable text scan + per-line `from_json` with a
   * corrupt-record field — one parse per line, same cost as the json
   * source. (The json file source itself REFUSES corrupt-column-only
   * projections unless the scan is cached — a non-starter at corpus
   * scale — so the quarantine channel parses from the text scan, where
   * no such restriction exists.)
   */
  def readWithQuarantine(spark: SparkSession, path: String,
                         schema: StructType): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.{col, from_json}
    val withCorrupt = schema.add("__corrupt", "string")
    val parsed = spark.read.text(path)
      .select(col("value"), from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "__corrupt")).as("j"))
    // from_json returns a NULL struct (not a populated __corrupt field)
    // for blank/whitespace-only lines — without the isNotNull guard those
    // land in `good` as all-null rows, neither parsed nor inspectable.
    val good = parsed
      .filter(col("j").isNotNull && col("j.__corrupt").isNull)
      .select(schema.fieldNames.map(f => col(s"j.$f").as(f)).toSeq: _*)
    val bad = parsed
      .filter(col("j").isNull || col("j.__corrupt").isNotNull)
      .select(col("value").as("raw_line"))
    (good, bad)
  }
}

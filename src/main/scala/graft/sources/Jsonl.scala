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
}

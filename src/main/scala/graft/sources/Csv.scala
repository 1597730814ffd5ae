package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * CSV staging round-trip — the reference's load path writes a temp CSV
 * (UTF-8, header, no index) and lets the warehouse re-infer the schema
 * from it (`source_format=CSV, autodetect=True`,
 * omnichannel_to_bq.py:143-156). This module is that path as a Spark
 * source/sink pair: [[write]] mirrors pandas `to_csv` conventions (header
 * row, nulls as empty cells), [[readInferred]] mirrors autodetect
 * (header + schema inference over the data).
 *
 * Parquet managed tables remain the engine's primary sink ([[Tables]]);
 * CSV exists for interchange with warehouses that ingest it, and because
 * inference-over-CSV is the reference's actual schema contract.
 */
object Csv {

  /** Write `df` as headered UTF-8 CSV, nulls as empty cells (the pandas
   * `to_csv` shape the reference stages through). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("nullValue", "")
      .csv(path)

  /** Read a headered CSV with schema inference — the `autodetect=True`
   * twin. Empty cells come back as nulls; `inferSchema` scans the data
   * once to type columns (long/double/timestamp/string), exactly like the
   * warehouse re-infers the staged file. */
  def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("nullValue", "")
      .csv(path)
}

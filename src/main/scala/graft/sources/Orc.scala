package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * ORC source/sink — the second columnar interchange format next to
 * parquet (warehouse estates are commonly mixed; an engine that can only
 * read one strands half the lake). Both directions are Spark's native
 * vectorized ORC scan/sink, so predicate pushdown, column pruning, and
 * whole-stage codegen behave exactly as for parquet — the spec pins the
 * pushdown behavior so a regression is visible.
 *
 * Scale: ORC stripes split like parquet row groups (reads parallelize
 * per stripe); writes emit one file per partition — `repartition(n)`
 * upstream chooses shard count. Zlib is the default codec; zstd is the
 * better ratio/speed point on modern clusters and is what we pin.
 */
object Orc {

  /** Write `df` as zstd-compressed ORC. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .orc(path)

  /** Read ORC (schema travels with the file; no inference pass). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional data-layout clustering via Z-order (Morton) curves —
 * the `OPTIMIZE ZORDER BY` capability of modern lakehouse writers
 * (Delta, Iceberg): rows close in BOTH key dimensions land in the same
 * file, so per-file min/max statistics prune scans filtered on EITHER
 * dimension. A single-column sort gives perfect pruning on one column
 * and none on the other; the space-filling curve trades a little of the
 * first for a lot of the second.
 *
 * Everything here is integer arithmetic in closed form (grid cells from
 * integer bounds, bit interleaving, prefix buckets), so the layout
 * assignment is deterministic across engines, partitionings, and
 * cluster sizes — the DuckDB twin recomputes it bit for bit. The
 * catalog-side rewrite that MATERIALIZES a Morton clustering into table
 * files is [[graft.tables.Tables.zorderCompact]] (double-scaled, n-ary,
 * spec-checked); this operator is the queryable assignment + statistics
 * surface that makes the layout's pruning value oracle-checkable.
 */
object Layout {

  /** Bit-interleave two `bitsPerDim`-wide cell coordinates into the
   * Morton code: bit `i` of `x` lands at even position `2i`, bit `i` of
   * `y` at odd position `2i + 1`. UNROLLED into a flat `2·bitsPerDim`-term
   * sum of shift/mask Columns — a higher-order `aggregate` lambda
   * evaluates interpreted per element and benched 4× slower than this
   * whole-stage-codegen form at sf0.1 (the same reduce-of-Columns shape
   * as [[graft.tables.Tables.zorderCompact]]). */
  private def morton(xCell: Column, yCell: Column, bitsPerDim: Int): Column =
    (0 until bitsPerDim).map { i =>
      shiftleft(shiftright(xCell, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yCell, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce[Column](_ + _)

  /**
   * Z-order layout assignment over two non-negative integer key columns:
   * each row gets its Morton `zval` on a `2^bitsPerDim` × `2^bitsPerDim`
   * grid spanned by the columns' actual min/max bounds, and `bucket` =
   * the zval's top `log2(nBuckets)` bits — the target file/partition.
   * Writing with `repartitionByRange(bucket)` + sort-within-partition on
   * `zval` materializes the layout; [[zorderStats]] measures what it
   * buys.
   *
   * Grid cells come from integer arithmetic over the global bounds
   * (`(v - min) * cells / (max - min + 1)`) — rank-free, so no global
   * sort is needed to place a row. The bounds ride a broadcast
   * single-row aggregate: at 100 TB the only full pass is the bounds
   * aggregate (or skip it — parquet footers already carry global
   * min/max), and assignment itself is a narrow codegen'd projection.
   *
   * `nBuckets` must be a power of four ≤ `4^bitsPerDim` so a bucket is
   * an aligned square of the grid (a Z-curve prefix), giving every
   * bucket tight bounds in BOTH dimensions.
   */
  def zorderLayout(df: DataFrame, xCol: String, yCol: String,
                   nBuckets: Int = 16, bitsPerDim: Int = 8): DataFrame = {
    require(nBuckets > 0 && (nBuckets & (nBuckets - 1)) == 0,
      "nBuckets must be a power of two")
    val bucketBits = 63 - java.lang.Long.numberOfLeadingZeros(nBuckets.toLong)
    require(bucketBits % 2 == 0 && bucketBits <= 2 * bitsPerDim,
      "nBuckets must be a power of four <= 4^bitsPerDim (aligned Z squares)")
    val cells = 1L << bitsPerDim
    val bounds = df.agg(
      min(col(xCol)).as("__minx"), max(col(xCol)).as("__maxx"),
      min(col(yCol)).as("__miny"), max(col(yCol)).as("__maxy"))
    df.crossJoin(broadcast(bounds))
      .withColumn("__cx", expr(
        s"($xCol - __minx) * ${cells}L div (__maxx - __minx + 1)"))
      .withColumn("__cy", expr(
        s"($yCol - __miny) * ${cells}L div (__maxy - __miny + 1)"))
      .withColumn("zval", morton(col("__cx"), col("__cy"), bitsPerDim))
      .withColumn("bucket",
        expr(s"shiftright(zval, ${2 * bitsPerDim - bucketBits})"))
      .drop("__minx", "__maxx", "__miny", "__maxy", "__cx", "__cy")
  }

  /**
   * Per-bucket min/max envelope of a Z-order layout — exactly the
   * statistics a file-skipping reader would consult, so the result IS
   * the pruning story: `nBuckets` aligned Z squares give every bucket a
   * span of ~`1/sqrt(nBuckets)` of EACH dimension's range (vs a
   * single-column sort: 1/nBuckets of one dimension, 100% of the
   * other). Emits (bucket, n_rows, x_min, x_max, y_min, y_max).
   *
   * Scale: one scan, narrow zval projection, then a hash aggregate on
   * `nBuckets` groups — map-side combine leaves bytes-per-partition at
   * O(nBuckets), never data-sized.
   */
  def zorderStats(df: DataFrame, xCol: String, yCol: String,
                  nBuckets: Int = 16, bitsPerDim: Int = 8): DataFrame =
    zorderLayout(df, xCol, yCol, nBuckets, bitsPerDim)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"))

  /**
   * Hilbert-curve layout assignment — [[zorderLayout]]'s interface with
   * the Morton code swapped for the Hilbert index
   * ([[graft.plans.HilbertIndex]], the native `graft_hilbert`
   * expression). Hilbert strictly dominates Morton on locality:
   * consecutive curve positions are always grid NEIGHBORS (no Z-shape
   * diagonal jumps across half the grid), so bucket envelopes are
   * tighter on average and range scans touch fewer buckets — the reason
   * Databricks moved liquid clustering from Z-order to Hilbert. Same
   * contract: `nBuckets` a power of four ≤ `4^bitsPerDim`, bucket =
   * the index's top bits (a Hilbert-curve prefix is a contiguous
   * quadrant region, so buckets are still aligned squares).
   *
   * Scale: identical shape to [[zorderLayout]] — one broadcast 1-row
   * bounds aggregate, then a narrow codegen'd projection (the index is
   * a ~10-statement Java loop inside whole-stage codegen, not an
   * unrolled expression tree).
   */
  def hilbertLayout(df: DataFrame, xCol: String, yCol: String,
                    nBuckets: Int = 16, bitsPerDim: Int = 8): DataFrame = {
    require(nBuckets > 0 && (nBuckets & (nBuckets - 1)) == 0,
      "nBuckets must be a power of two")
    val bucketBits = 63 - java.lang.Long.numberOfLeadingZeros(nBuckets.toLong)
    require(bucketBits % 2 == 0 && bucketBits <= 2 * bitsPerDim,
      "nBuckets must be a power of four <= 4^bitsPerDim (aligned squares)")
    val cells = 1L << bitsPerDim
    val bounds = df.agg(
      min(col(xCol)).as("__minx"), max(col(xCol)).as("__maxx"),
      min(col(yCol)).as("__miny"), max(col(yCol)).as("__maxy"))
    df.crossJoin(broadcast(bounds))
      .withColumn("__cx", expr(
        s"($xCol - __minx) * ${cells}L div (__maxx - __minx + 1)"))
      .withColumn("__cy", expr(
        s"($yCol - __miny) * ${cells}L div (__maxy - __miny + 1)"))
      .withColumn("hval", expr(s"graft_hilbert(__cx, __cy, $bitsPerDim)"))
      .withColumn("bucket",
        expr(s"shiftright(hval, ${2 * bitsPerDim - bucketBits})"))
      .drop("__minx", "__maxx", "__miny", "__maxy", "__cx", "__cy")
  }

  /** Per-bucket min/max envelopes of a Hilbert layout — the pruning
   * statistics surface of [[hilbertLayout]], same shape as
   * [[zorderStats]]. */
  def hilbertStats(df: DataFrame, xCol: String, yCol: String,
                   nBuckets: Int = 16, bitsPerDim: Int = 8): DataFrame =
    hilbertLayout(df, xCol, yCol, nBuckets, bitsPerDim)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"))
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Reference-parity relational operators: global sort, preview, time-range
 * filter, and MERGE-style upsert (SURVEY.md §2.2, §2.3, §2.6).
 */
object Relational {

  /**
   * Global ascending sort by an event-time column, nulls last
   * (reference: omnichannel_to_bq.py:107-116; pandas default
   * `na_position='last'`). No-op with absent column (:114-115).
   *
   * Scale: Spark executes this as a range-partitioned exchange + per-partition
   * sort — the only correct distributed total sort. `tieBreak` columns make
   * the order fully deterministic for tests.
   */
  def sortByCreatedAt(df: DataFrame, column: String = "created_at",
                      tieBreak: Seq[String] = Nil): DataFrame =
    if (!df.columns.contains(column)) df
    else df.orderBy((asc_nulls_last(column) +: tieBreak.map(asc)): _*)

  /** head-N preview (reference: omnichannel_to_bq.py:118-123). Catalyst
   * collapses sort+limit upstream into TakeOrderedAndProject. */
  def preview(df: DataFrame, n: Int = 5): DataFrame = df.limit(n)

  /**
   * `[since, to)` half-open time-range predicate — the reference's only
   * pushed-down filter (omnichannel_to_bq.py:41, SURVEY.md §2.1-S3). The
   * literal is cast to the column's own type so TIMESTAMP and TIMESTAMP_NTZ
   * sources both get a pushable comparison (shows up as PushedFilters in the
   * parquet scan).
   */
  def timeRange(df: DataFrame, column: String,
                sinceInclusive: String, toExclusive: String): DataFrame = {
    val dt = df.schema(column).dataType
    df.filter(col(column) >= lit(sinceInclusive).cast(dt) &&
              col(column) <  lit(toExclusive).cast(dt))
  }

  /**
   * MERGE-style upsert (reference: omnichannel_to_bq.py:167-191): staging
   * rows replace matching main rows (UPDATE all non-key columns) and are
   * inserted when unmatched — exactly `anti-join + union`.
   *
   * Scale: the anti join shuffles on the key unless the staging side is
   * broadcastable. By default we leave strategy choice to Catalyst/AQE
   * (which broadcasts automatically under autoBroadcastJoinThreshold);
   * `broadcastStaging = true` forces the hint for callers that KNOW the
   * batch is small — an unconditional hint on an arbitrarily large staging
   * batch would OOM executors. Ragged schemas are tolerated via
   * `unionByName(allowMissingColumns = true)` (SURVEY.md §7.4.5); note
   * main-side columns missing from staging are NULL on updated rows —
   * callers that need column preservation must align schemas first.
   *
   * Precondition: unique keys in `staging` — BigQuery MERGE errors on
   * duplicate source keys (omnichannel_to_bq.py:184-185); callers enforce via
   * [[assertUniqueKeys]] or [[dedupeLatest]].
   */
  def upsertPlan(main: DataFrame, staging: DataFrame, key: String,
                 broadcastStaging: Boolean = false): DataFrame = {
    val s = if (broadcastStaging) broadcast(staging) else staging
    main.join(s, Seq(key), "left_anti")
      .unionByName(staging, allowMissingColumns = true)
  }

  /**
   * Mirror of BigQuery MERGE's duplicate-source-key error
   * (omnichannel_to_bq.py:184-185): throws when `staging[key]` has dups.
   * One cheap aggregate; runs before the upsert write.
   */
  def assertUniqueKeys(staging: DataFrame, key: String): Unit = {
    val dups = staging.groupBy(key).count().filter(col("count") > 1).limit(1).collect()
    if (dups.nonEmpty)
      throw new IllegalArgumentException(
        s"duplicate key '${dups.head.get(0)}' in staging column '$key' " +
        "(BigQuery MERGE would fail; dedupe with Relational.dedupeLatest)")
  }

  /**
   * Column-preserving upsert — exact BigQuery-MERGE semantics on ragged
   * schemas (reference: omnichannel_to_bq.py:167-191 SETs only the staging
   * schema's columns): matched main rows take ALL staging column values
   * (including nulls) but keep main-only columns; inserted rows get null
   * for main-only columns. [[upsertPlan]]'s anti-join+union is cheaper and
   * identical when schemas match; this variant is for staging batches with
   * a column subset.
   *
   * Plan shape: one left_outer join from main (update side) + one anti
   * join for inserts, both on the key — Catalyst/AQE broadcasts staging
   * when small, same as upsertPlan.
   */
  def upsertPlanPreserving(main: DataFrame, staging: DataFrame,
                           key: String): DataFrame = {
    val sCols = staging.columns.toSet
    require(sCols.contains(key), s"staging lacks key column '$key'")
    val sPref = staging.columns.foldLeft(staging)((d, c) =>
      d.withColumnRenamed(c, s"__s_$c"))
    val matchedMarker = col(s"__s_$key").isNotNull
    val updated = main.join(sPref, main(key) === col(s"__s_$key"), "left_outer")
      .select(main.columns.map { c =>
        if (sCols.contains(c))
          when(matchedMarker, col(s"__s_$c")).otherwise(main(c)).as(c)
        else main(c).as(c)
      }.toSeq: _*)
    val inserts = staging.join(main.select(key), Seq(key), "left_anti")
    updated.unionByName(inserts, allowMissingColumns = true)
  }

  /**
   * Skew-resistant equi-join: the big side gets a per-row salt, the small
   * side is replicated across all `salts` values, and the join runs on
   * (key, salt) — one hot key spreads over `salts` reducers instead of one.
   * Result set is identical to `big.join(small, key)` (inner); only the
   * physical distribution changes. Prefer AQE's automatic skew-join
   * splitting for sort-merge joins; salting is for the cases AQE cannot
   * rewrite (e.g. skewed aggregation feeding a join, or forced
   * shuffle-hash joins).
   */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /**
   * Keep the latest row per key — the canonical fix for duplicate staging
   * keys (SURVEY.md §2.5): `row_number() over (partition by key order by
   * orderCol desc) = 1`.
   */
  def dedupeLatest(df: DataFrame, key: String, orderCol: String,
                   tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(key)
      .orderBy((col(orderCol).desc +: tieBreak.map(col(_).desc)): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}

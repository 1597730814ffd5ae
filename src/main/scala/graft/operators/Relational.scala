package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

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
   * AS-OF join: each left row picks up the LATEST right row with
   * `right.ts <= left.ts` for its key (inclusive; unmatched lefts keep
   * nulls — LEFT ASOF semantics). Spark has no native as-of join; this is
   * the union + running-`last(ignoreNulls)` window composition:
   * both sides union by name, order within each key by (ts, side) so a
   * right row at the same timestamp sorts before the left row that should
   * see it, and the right value columns propagate forward.
   *
   * Scale: ONE shuffle on the key (the window partition) — same exchange
   * count as a plain equi-join, no range explosion. Precondition: right is
   * unique per (key, ts); right value columns must not collide with left
   * column names (rename before calling); `tsCol` must be named the same
   * on both sides.
   *
   * `tolerance` (a SQL interval body, e.g. `"7 days"`) bounds how STALE a
   * match may be — pandas `merge_asof(tolerance=...)` / feature-store
   * point-in-time semantics: the latest right row is still the only
   * candidate, but if it is older than `left.ts − tolerance` the left row
   * keeps nulls instead of a stale value. Same plan; the matched struct
   * additionally carries the right timestamp and all value columns null
   * out together when it is stale.
   *
   * Row-level matching: the right row rides the window as ONE struct
   * filled with `last(ignoreNulls)` — a struct is non-null whenever the
   * row exists, so the matched timestamp and every value column come from
   * the SAME right row even when that row holds nulls in some value
   * columns (independently filled columns would smuggle older values past
   * the freshness bound and diverge from pandas/DuckDB ASOF).
   */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               tsCol: String, tolerance: Option[String] = None): DataFrame = {
    val valueCols = right.columns.filterNot(c => c == key || c == tsCol).toSeq
    require(valueCols.nonEmpty, "right side needs at least one value column")
    val collisions = valueCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"rename right columns colliding with left: $collisions")
    val l = left.withColumn("__side", lit(1))
    val r = right.withColumn("__side", lit(0))
      .withColumn("__m", struct(
        col(tsCol).as("__rts") +: valueCols.map(col): _*))
      .select((Seq(key, tsCol, "__side", "__m").map(col)): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last(col("__m"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val fresh = tolerance match {
      case None => col("__m").isNotNull
      case Some(iv) => col("__m").isNotNull &&
        col(tsCol) <= col("__m")("__rts") + expr(s"INTERVAL $iv")
    }
    valueCols.foldLeft(matched) { (d, c) =>
        d.withColumn(c, when(fresh, col("__m")(c)))
      }
      .drop("__side", "__m")
  }

  /**
   * Range (interval) join WITHOUT an equi key: left rows whose `lTs` falls
   * in `[rStart, rEnd)` of right rows. A naive formulation is a cross join
   * with a post-filter — quadratic. This one buckets time by
   * `bucketSeconds`: each right interval explodes over the coarse buckets
   * it covers, each left row owns one bucket, and the join runs as an
   * EQUI-join on the bucket plus the exact range refinement — candidate
   * volume is (pairs per bucket), not |L| x |R|. Choose bucketSeconds near
   * the typical interval length; intervals explode to
   * ~len/bucketSeconds + 1 rows each.
   */
  def rangeJoin(left: DataFrame, lTs: String,
                right: DataFrame, rStart: String, rEnd: String,
                bucketSeconds: Long = 21600): DataFrame = {
    // CAST AS TIMESTAMP: no-op for session-zoned inputs, NTZ tolerance
    // otherwise (unix_timestamp rejects TIMESTAMP_NTZ — see Sessions.tsUs)
    val lB = left.withColumn("__bucket",
      (unix_timestamp(col(lTs).cast(org.apache.spark.sql.types.TimestampType))
        / bucketSeconds).cast("long"))
    val rB = right.withColumn("__bucket", explode(expr(
      s"sequence(CAST(unix_timestamp(CAST($rStart AS TIMESTAMP)) / $bucketSeconds AS BIGINT), " +
      s"CAST(unix_timestamp(CAST($rEnd AS TIMESTAMP) - INTERVAL 1 MICROSECOND) / $bucketSeconds AS BIGINT))")))
    lB.join(rB, Seq("__bucket"))
      .filter(col(lTs) >= col(rStart) && col(lTs) < col(rEnd))
      .drop("__bucket")
  }

  /**
   * Interval OVERLAP join (both sides are intervals, no equi key): pairs
   * where `[aStart, aEnd)` and `[bStart, bEnd)` intersect. Same coarse
   * time-bucket scheme as [[rangeJoin]]: each interval explodes over the
   * buckets it covers, the join runs as an equi-join on the bucket with
   * the exact overlap refinement, and double-counting across shared
   * buckets is removed by keeping each pair only in the FIRST bucket both
   * cover (max of the two start buckets) — dedup by arithmetic, not a
   * `distinct` shuffle.
   */
  def intervalOverlapJoin(a: DataFrame, aStart: String, aEnd: String,
                          b: DataFrame, bStart: String, bEnd: String,
                          bucketSeconds: Long = 21600): DataFrame = {
    def bucketed(df: DataFrame, s: String, e: String, tag: String) =
      df.withColumn(s"__b0_$tag",
          (unix_timestamp(col(s).cast(org.apache.spark.sql.types.TimestampType))
            / bucketSeconds).cast("long"))
        .withColumn("__bucket", explode(expr(
          s"sequence(CAST(unix_timestamp(CAST($s AS TIMESTAMP)) / $bucketSeconds AS BIGINT), " +
          s"CAST(unix_timestamp(CAST($e AS TIMESTAMP) - INTERVAL 1 MICROSECOND) / $bucketSeconds AS BIGINT))")))
    val aB = bucketed(a, aStart, aEnd, "a")
    val bB = bucketed(b, bStart, bEnd, "b")
    aB.join(bB, Seq("__bucket"))
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      .filter(col("__bucket") === greatest(col("__b0_a"), col("__b0_b")))
      .drop("__bucket", "__b0_a", "__b0_b")
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
    // The salt must be a pure function of row content: a positional
    // source (MID, rand) re-evaluates differently when a replayed map
    // task reorders rows after a fetch failure, and the (key, salt)
    // join then drops/duplicates rows (SPARK-23207). Hashing the whole
    // row spreads a hot key across salts as long as its rows differ in
    // ANY column — exact full-row duplicates share a salt, which only
    // costs balance, never correctness.
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toSeq: _*),
        lit(salts.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /**
   * Bloom-filter-accelerated semi join: keep big-side rows whose `key`
   * exists on the small side, pre-filtering the big side with a broadcast
   * Bloom filter BEFORE the exact semi join. The result is EXACTLY the
   * semi join — the Bloom filter has no false negatives, and its false
   * positives are removed by the exact join — so the filter is purely a
   * shuffle-volume reducer, the hand-rolled form of Spark's runtime
   * bloom-filter join filters (SPARK-32268) with an explicit, testable
   * contract.
   *
   * Scale: the driver materializes `bits` bits (8 KiB at the default) —
   * the distinct-positions collect is bounded by `bits`, never by the
   * small side's row count. The big side evaluates `numHashes` codegen'd
   * xxhash64 probes per row against a broadcast literal mask and only
   * surviving rows reach the exchange; with a selective small side the
   * shuffle shrinks by the selectivity factor. The exact semi join
   * shuffles the small side's distinct keys only.
   */
  def bloomSemiJoin(big: DataFrame, small: DataFrame, key: String,
                    bits: Int = 1 << 16, numHashes: Int = 4): DataFrame = {
    require(bits > 0 && bits % 64 == 0, "bits must be a positive multiple of 64")
    val pos = (i: Int) => s"pmod(xxhash64(`$key`, $i), ${bits}L)"
    val positions = small
      .select(explode(array((0 until numHashes).map(i =>
        expr(pos(i))): _*)).as("p"))
      .distinct().collect().map(_.getLong(0))
    val words = new Array[Long](bits / 64)
    positions.foreach(p => words((p >> 6).toInt) |= (1L << (p & 63)))
    val probe = (0 until numHashes).map { i =>
      s"((element_at(__bloom, CAST(${pos(i)} DIV 64 AS INT) + 1) " +
        s">> CAST(${pos(i)} % 64 AS INT)) & 1) = 1"
    }.mkString(" AND ")
    big
      .withColumn("__bloom", typedLit(words.toSeq))
      .filter(expr(probe))
      .drop("__bloom")
      .join(small.select(col(key)).distinct(), Seq(key), "left_semi")
  }

  /**
   * Per-group discrete percentiles from a deterministic hash sample — the
   * 100 TB percentile path. Exact `percentile_disc` sorts every group's
   * full value set; at corpus scale the sort dominates the job. Sampling
   * rows whose reproducible id hash lands in `keepPct` of 100 buckets
   * bounds the sorted volume to keepPct% of the corpus while the
   * estimate's error shrinks as 1/sqrt(sample size) — at billions of rows
   * a 1% sample's percentile error is negligible, and the hash selection
   * makes the estimate run-, engine- and partitioning-invariant (same
   * bucket trick as train/val splitting, so the DuckDB oracle reproduces
   * the exact sample and the exact output).
   *
   * Emits one row per group: (groupCol, p25, p50, p75, n_sample).
   */
  def sampledPercentiles(df: DataFrame, valueCol: String, groupCol: String,
                         idCol: String, keepPct: Int = 10): DataFrame = {
    require(keepPct >= 1 && keepPct <= 100, "keepPct in 1..100")
    df
      .filter(expr(s"${TextFns.polyHashFragment(
          s"CAST(`$idCol` AS STRING)", 31, TextFns.HashMod)} % 100")
        < keepPct)
      .groupBy(groupCol)
      .agg(
        expr(s"percentile_disc(0.25) WITHIN GROUP (ORDER BY `$valueCol`)").as("p25"),
        expr(s"percentile_disc(0.5) WITHIN GROUP (ORDER BY `$valueCol`)").as("p50"),
        expr(s"percentile_disc(0.75) WITHIN GROUP (ORDER BY `$valueCol`)").as("p75"),
        count(lit(1)).as("n_sample"))
  }

  /**
   * Pivot: one row per `groupCol`, one BIGINT count column per declared
   * `pivotCol` value (absent combinations = 0). Values are declared
   * explicitly — never discovered at plan time — so the output schema is
   * static and the job is ONE aggregate pass instead of
   * distinct-values-scan + aggregate.
   */
  def pivotCounts(df: DataFrame, groupCol: String, pivotCol: String,
                  values: Seq[String]): DataFrame =
    df.groupBy(groupCol)
      .pivot(pivotCol, values)
      .agg(count(lit(1)))
      .na.fill(0L, values)

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

  /**
   * Assembled per-group ranking — grouped `row_number` WITHOUT a
   * per-group sort task: a `Window.partitionBy(group)` sends every row
   * of a group to ONE task, which is a single-task bottleneck for any
   * group at corpus scale. Instead: range-exchange on (group, orderCols)
   * so no task ever holds a whole group, `row_number` within each
   * (range-partition × group) slice, and each slice's exact global
   * offset from a partitions×groups-row count aggregate that broadcasts
   * back (the only unpartitioned window runs over that tiny frame).
   * Appends `rankCol` (1-based within the group, ordered by `orderCols`)
   * and `nCol` (group size). `orderCols` must make rows unique within a
   * group for the rank to be deterministic.
   *
   * Shared by [[graft.operators.Curation.qualityCalibrate]] (per-source
   * quality ranks) and [[trimmedStats]] (per-group trim bounds); the
   * global-rank special case is [[graft.operators.Curation.qualityBand]].
   */
  def groupedRanks(df: DataFrame, grpCol: String, orderCols: Seq[Column],
                   rankCol: String, nCol: String): DataFrame = {
    // The ranged frame is referenced TWICE (offsets aggregate + rank join)
    // and its `__pid` values are only meaningful if both consumers see the
    // SAME physical partitioning. Two separately-planned range exchanges
    // are not guaranteed identical: column pruning can make the subplans
    // differ (defeating ReuseExchange), and AQE may coalesce the two
    // shuffles to different partition counts — either way the __pid spaces
    // would disagree and the (__pid, grp) join would rank wrongly. Pinning
    // with an eager localCheckpoint (the bm25TopK / pageRank pattern)
    // materializes one physical partitioning that both references share.
    val ranged = df
      .repartitionByRange((col(grpCol).asc +: orderCols): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val perPart = Window.partitionBy(col("__pid"), col(grpCol))
      .orderBy(orderCols: _*)
    val perGrp = Window.partitionBy(grpCol).orderBy("__pid")
    val offsets = ranged.groupBy(col("__pid"), col(grpCol))
      .agg(count(lit(1)).as("__cnt"))
      .select(col("__pid"), col(grpCol),
        coalesce(sum("__cnt").over(
          perGrp.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .as("__off"),
        sum("__cnt").over(
          perGrp.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)).as(nCol))
    ranged
      .withColumn("__rn", row_number().over(perPart).cast("long"))
      .join(broadcast(offsets), Seq("__pid", grpCol))
      .withColumn(rankCol, col("__off") + col("__rn"))
      .drop("__pid", "__rn", "__off")
  }

  /**
   * Assembled range-partitioned cumulative sums — the scale-safe
   * replacement for an unpartitioned `Window.orderBy(...)` running sum
   * (which funnels the whole frame through ONE task): the
   * [[groupedRanks]] pattern applied to sums. Range-exchange on
   * (`grpCols`, `orderCols`), compute each partition's running sums
   * locally, aggregate per-(partition, group) totals into a TINY
   * offsets frame (≤ shuffle-partitions × |groups| rows — the only
   * unpartitioned window runs over THAT), and broadcast the prefix
   * offsets back. Exactly the same integers as the single-task window,
   * no single-task stage, at any input cardinality.
   *
   * For each `(inCol, cumCol, totCol)` spec this appends `cumCol` (the
   * group-wide running BIGINT sum of `inCol` over rows ≤ current in
   * `orderCols` order, current row INCLUSIVE) and `totCol` (the group
   * grand total — read off the offsets frame, so consumers needing
   * totals-per-row pay no extra scan). Rows must be unique per
   * (`grpCols`, `orderCols`) for the running sum to be well-defined —
   * both consumers ([[graft.operators.Curation.ksDriftFromCounts]],
   * [[graft.operators.Curation.classifierAuc]]) pass distinct-value
   * frames. `grpCols` empty = one global cumulative pass.
   *
   * The eager localCheckpoint pins ONE physical range partitioning for
   * the two consumers of `__pid` (running-sum side and offsets side) —
   * same reasoning as [[groupedRanks]]'s pin.
   */
  def rangedCumSums(df: DataFrame, grpCols: Seq[String],
                    orderCols: Seq[Column],
                    specs: Seq[(String, String, String)]): DataFrame = {
    require(specs.nonEmpty && orderCols.nonEmpty,
      "rangedCumSums needs at least one order column and one sum spec")
    val grpC = grpCols.map(col)
    val ranged = df
      .repartitionByRange((grpC.map(_.asc) ++ orderCols): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val perPart = Window.partitionBy((col("__pid") +: grpC): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perGrp = Window.partitionBy(grpC: _*).orderBy("__pid")
    val offsets = ranged.groupBy((col("__pid") +: grpC): _*)
      .agg(sum(col(specs.head._1)).as(s"__t_${specs.head._1}"),
        specs.tail.map(s => sum(col(s._1)).as(s"__t_${s._1}")): _*)
      .select((col("__pid") +: grpC) ++ specs.flatMap {
        case (in, _, tot) => Seq(
          coalesce(sum(col(s"__t_$in")).over(perGrp
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
            .as(s"__ofs_$in"),
          sum(col(s"__t_$in")).over(perGrp
            .rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)).as(tot))
      }: _*)
    specs.foldLeft(
        ranged.join(broadcast(offsets), "__pid" +: grpCols)) {
        case (acc, (in, cum, _)) =>
          acc.withColumn(cum,
            col(s"__ofs_$in") + sum(col(in)).over(perPart))
      }
      .drop("__pid" +: specs.map(s => s"__ofs_${s._1}"): _*)
  }

  /**
   * Robust (trimmed) per-group statistics of a numeric column: drop the
   * lowest `lowPermille`‰ and highest `highPermille`‰ of each group by
   * value, then report the mean of the surviving middle — the
   * outlier-resistant location estimate for monitoring metric columns
   * whose tails are garbage (sentinel values, unit mix-ups). Emits
   * (grpCol, n_total, n_used, trimmed_mean_micro).
   *
   * Exactness: values are quantized to micro-unit BIGINTs up front
   * (round(x·1e6) — the [[graft.operators.Similarity.embeddingCentroids]]
   * fixed point), trim bounds are integer ranks from [[groupedRanks]],
   * and the mean is one floored division of associative integer sums —
   * nothing order-dependent anywhere.
   */
  def trimmedStats(df: DataFrame, grpCol: String = "event_type",
                   valCol: String = "value", tieCol: String = "event_id",
                   lowPermille: Int = 100,
                   highPermille: Int = 100): DataFrame = {
    val m = df.select(col(grpCol),
      expr(s"CAST(round($valCol * 1000000) AS BIGINT)").as("__vm"),
      col(tieCol))
    groupedRanks(m, grpCol, Seq(col("__vm").asc, col(tieCol).asc),
      "__rk", "__n")
      .filter(col("__rk") > floor(col("__n") * lowPermille / 1000) &&
        col("__rk") <= col("__n") - floor(col("__n") * highPermille / 1000))
      .groupBy(grpCol)
      .agg(max("__n").as("n_total"),
        count(lit(1)).as("n_used"),
        sum("__vm").as("__s"))
      .withColumn("trimmed_mean_micro",
        floor(col("__s").cast("double") / col("n_used")).cast("long"))
      .select(col(grpCol), col("n_total"), col("n_used"),
        col("trimmed_mean_micro"))
  }

  /**
   * Winsorized group statistics — [[trimmedStats]]' clamping sibling:
   * values outside the central permille band are CLIPPED to the band's
   * boundary values instead of dropped, so every row still contributes
   * (the estimator of choice when outliers carry signal about volume
   * but not magnitude — payment spikes, token-count explosions). Emits
   * (grpCol, n_total, n_clipped_low, n_clipped_high,
   * winsorized_mean_micro) with the same micro-unit integer discipline
   * as trimmedStats: boundary values come from integer ranks, the
   * clamped sum is associative BIGINT, the mean is one floored
   * division. Groups too small for the band (every rank clipped) drop
   * from the result, matching trimmedStats' behavior.
   *
   * Scale: one [[groupedRanks]] assembled-rank pass (no single task
   * sorts a whole group), a per-group bounds aggregate over the kept
   * band, and one broadcast-sized join back on the group key.
   */
  def winsorizedStats(df: DataFrame, grpCol: String = "event_type",
                      valCol: String = "value", tieCol: String = "event_id",
                      lowPermille: Int = 100,
                      highPermille: Int = 100): DataFrame = {
    val m = df.select(col(grpCol),
      expr(s"CAST(round($valCol * 1000000) AS BIGINT)").as("__vm"),
      col(tieCol))
    val ranked = groupedRanks(m, grpCol, Seq(col("__vm").asc, col(tieCol).asc),
      "__rk", "__n")
    val bounds = ranked
      .filter(col("__rk") > floor(col("__n") * lowPermille / 1000) &&
        col("__rk") <= col("__n") - floor(col("__n") * highPermille / 1000))
      .groupBy(grpCol)
      .agg(min("__vm").as("__lo"), max("__vm").as("__hi"))
    ranked.join(broadcast(bounds), grpCol :: Nil)
      .groupBy(grpCol)
      .agg(max("__n").as("n_total"),
        sum(when(col("__vm") < col("__lo"), 1L).otherwise(0L))
          .as("n_clipped_low"),
        sum(when(col("__vm") > col("__hi"), 1L).otherwise(0L))
          .as("n_clipped_high"),
        sum(greatest(least(col("__vm"), col("__hi")), col("__lo")))
          .as("__s"))
      .withColumn("winsorized_mean_micro",
        floor(col("__s").cast("double") / col("n_total")).cast("long"))
      .select(col(grpCol), col("n_total"), col("n_clipped_low"),
        col("n_clipped_high"), col("winsorized_mean_micro"))
  }

  /**
   * Exact per-group percentiles by integer rank — the third cell of the
   * percentile matrix: `percentile_disc` (the `value_percentiles`
   * query) is exact but buffers every group's values inside one
   * aggregation buffer (group-cardinality memory — the thing that dies
   * first at 100 TB), and [[sampledPercentiles]] is bounded but a 1%
   * estimate. This one is exact AND bounded: values quantize to
   * micro-unit BIGINTs, ranks come from the assembled [[groupedRanks]]
   * pass (range exchange + per-partition ranks — no group ever sits in
   * one buffer or one task), and
   * each requested permille `p` reads the value at rank
   * `max(1, ceil(p·n/1000))` (p = 0 → the minimum, p = 1000 → the
   * maximum — the "lower discrete quantile" convention, stated here
   * because engines disagree on it). Emits one row per
   * (group, permille): (grpCol, permille, value_micro, rank, n); the
   * integer definition makes the result partition-, run- and
   * engine-invariant, so the oracle recomputes it with the same rank
   * arithmetic rather than its own quantile built-in.
   *
   * Scale: one range exchange + per-partition ranks ([[groupedRanks]]),
   * then a narrow membership filter — the |permilles|-way explode runs
   * only on rows whose rank IS a requested target, never on the corpus.
   */
  def groupedPercentiles(df: DataFrame, grpCol: String = "event_type",
                         valCol: String = "value",
                         tieCol: String = "event_id",
                         permilles: Seq[Int] =
                           Seq(0, 50, 500, 950, 990, 1000)): DataFrame =
    groupedPercentilesMicro(
      df.select(col(grpCol),
        expr(s"CAST(round($valCol * 1000000) AS BIGINT)").as("__vm"),
        col(tieCol)),
      grpCol, "__vm", tieCol, permilles)

  /** [[groupedPercentiles]] over an ALREADY-quantized BIGINT column —
   * the composition shape: a second percentile pass over values that
   * are themselves micro-units (e.g. [[madOutliers]]'s absolute
   * deviations) must not re-quantize through a double round-trip.
   * Same rank arithmetic, same output columns. NULL values DROP before
   * ranking (the [[graft.operators.Curation.valueCounts]] contract):
   * Spark's nulls-first ascending sort would otherwise rank nulls
   * below every real value, skewing every percentile and diverging
   * from SQL engines' NULLS-LAST / null-skipping quantile defaults. */
  def groupedPercentilesMicro(df: DataFrame, grpCol: String,
                              microCol: String, tieCol: String,
                              permilles: Seq[Int]): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p >= 0 && p <= 1000),
      "permilles must be in [0, 1000]")
    val pSql = permilles.distinct.sorted.mkString("array(", ", ", ")")
    val m = df.filter(col(microCol).isNotNull)
      .select(col(grpCol), col(microCol).cast("long").as("__vm"),
        col(tieCol))
    groupedRanks(m, grpCol, Seq(col("__vm").asc, col(tieCol).asc),
      "__rk", "__n")
      .withColumn("__tg", expr(
        s"""transform($pSql, p ->
           |  greatest(CAST(1 AS BIGINT),
           |           (CAST(p AS BIGINT) * __n + 999) DIV 1000))"""
          .stripMargin))
      .filter(expr("array_contains(__tg, __rk)"))
      .select(col(grpCol), col("__vm"), col("__rk"), col("__n"),
        posexplode(col("__tg")))
      .filter(col("col") === col("__rk"))
      .withColumn("permille",
        element_at(expr(pSql), col("pos").cast("int") + 1).cast("long"))
      .select(col(grpCol), col("permille"),
        col("__vm").as("value_micro"), col("__rk").as("rank"),
        col("__n").as("n"))
  }

  /**
   * Per-group IQR (Tukey fence) outlier flags — the boxplot monitor
   * run over every metric column before its rows are trusted: values
   * outside `[q1 − f·IQR, q3 + f·IQR]` (f = `fencePermille`/1000,
   * default the classic 1.5) are flagged per group. Composes
   * [[groupedPercentiles]] for exact integer quartiles (micro-unit
   * rank values — no estimation, no per-group buffer), so the fences —
   * and therefore the flagged set — are partition-, run- and
   * engine-invariant; fence arithmetic is BIGINT with truncating DIV
   * on the (non-negative) IQR. Emits ONLY the outlier rows, sparse by
   * contract: (grpCol, tieCol, value_micro, lo_micro, hi_micro).
   *
   * Scale: one assembled-rank pass over the corpus + a broadcast join
   * of the group-cardinality fence frame back onto a narrow
   * projection. Groups where IQR = 0 flag everything off the single
   * point — the statistically honest reading of a degenerate box.
   */
  def iqrOutliers(df: DataFrame, grpCol: String = "event_type",
                  valCol: String = "value", tieCol: String = "event_id",
                  fencePermille: Long = 1500L): DataFrame = {
    require(fencePermille >= 0, "fencePermille must be >= 0")
    val q = groupedPercentiles(df, grpCol, valCol, tieCol,
        permilles = Seq(250, 750))
      .groupBy(grpCol)
      .agg(
        max(when(col("permille") === 250, col("value_micro"))).as("__q1"),
        max(when(col("permille") === 750, col("value_micro"))).as("__q3"))
      .withColumn("lo_micro", expr(
        s"__q1 - ($fencePermille * (__q3 - __q1)) DIV 1000"))
      .withColumn("hi_micro", expr(
        s"__q3 + ($fencePermille * (__q3 - __q1)) DIV 1000"))
      .select(grpCol, "lo_micro", "hi_micro")
    df.select(col(grpCol), col(tieCol),
        expr(s"CAST(round($valCol * 1000000) AS BIGINT)").as("value_micro"))
      .join(broadcast(q), grpCol)
      .filter(col("value_micro") < col("lo_micro") ||
        col("value_micro") > col("hi_micro"))
      .select(col(grpCol), col(tieCol), col("value_micro"),
        col("lo_micro"), col("hi_micro"))
  }

  /**
   * Median/MAD robust outlier flags per group — the modified-z-score
   * monitor (Iglewicz–Hoaglin): rows whose absolute deviation from the
   * group median exceeds `kPermille/1000 × MAD` are flagged, where MAD
   * is the median of the absolute deviations. The default 5190 ≈
   * 3.5/0.6745 in permille — the classic |modified z| > 3.5 rule.
   * Complements [[iqrOutliers]]: Tukey fences use the quartile box
   * (breaks down under 25% contamination per tail), MAD tolerates up
   * to 50% contamination — the robust pick when a feed can go MOSTLY
   * bad.
   *
   * Both medians ride the exact integer rank machinery
   * ([[groupedPercentilesMicro]], lower-discrete-quantile convention,
   * ties broken by `tieCol`) — no per-group buffer, no single-task
   * window, partition-/run-/engine-invariant. The fence compares
   * `|v − med| · 1000 > kPermille · MAD` in BIGINT (no division; both
   * sides stay under 2⁶³ for micro values within ±10¹⁵ and kPermille
   * ≤ ~9000 — the operating range). Groups where MAD = 0 (over half
   * the group at one value) flag every off-median row — the honest
   * reading of a degenerate scale estimate, same posture as
   * [[iqrOutliers]]'s zero-IQR box. Emits ONLY the flagged rows:
   * (grpCol, tieCol, value_micro, med_micro, mad_micro).
   *
   * Scale: two assembled-rank passes (corpus → medians, deviations →
   * MADs) + broadcast joins of the group-cardinality stats frames back
   * onto narrow projections.
   */
  def madOutliers(df: DataFrame, grpCol: String = "event_type",
                  valCol: String = "value", tieCol: String = "event_id",
                  kPermille: Long = 5190L): DataFrame = {
    require(kPermille >= 0, "kPermille must be >= 0")
    val m = df.select(col(grpCol), col(tieCol),
      expr(s"CAST(round($valCol * 1000000) AS BIGINT)").as("value_micro"))
    val med = groupedPercentilesMicro(m, grpCol, "value_micro", tieCol,
        permilles = Seq(500))
      .select(col(grpCol), col("value_micro").as("med_micro"))
    val dev = m.join(broadcast(med), Seq(grpCol))
      .withColumn("__dev", abs(col("value_micro") - col("med_micro")))
    val mad = groupedPercentilesMicro(
        dev.select(col(grpCol), col("__dev"), col(tieCol)),
        grpCol, "__dev", tieCol, permilles = Seq(500))
      .select(col(grpCol), col("value_micro").as("mad_micro"))
    dev.join(broadcast(mad), Seq(grpCol))
      .filter(col("__dev") * 1000L > lit(kPermille) * col("mad_micro"))
      .select(col(grpCol), col(tieCol), col("value_micro"),
        col("med_micro"), col("mad_micro"))
  }

  /**
   * Order-invariant content fingerprint over chosen columns — the
   * snapshot-equality checksum for 100 TB table management: two
   * replicas, a table before/after a rename-swap, or an upsert target
   * vs its recomputed expectation compare by ONE row each, with no
   * sort and no join. Per row, the reproducible polynomial hash of the
   * `\u0001`-joined canonical column strings (nulls encoded as a
   * `\u0002` sentinel so ("a", null) ≠ (null, "a")); the fingerprint
   * is the SUM of row hashes mod the hash modulus plus the row count —
   * associative, so partition-, order- and engine-invariant, and the
   * DuckDB twin recomputes the identical arithmetic.
   *
   * Contract: pass integer/string-typed columns only (double and
   * timestamp string forms diverge across engines — quantize first,
   * the corpus-wide rule). This is a CHECKSUM, not a proof: any
   * single-row insert/delete/change flips it unless the hash delta is
   * ≡ 0 mod p (~1e-9); adversarial collisions are out of scope. Emits
   * (n_rows, fingerprint).
   *
   * Scale: one narrow projection + one 1-row aggregate — the cheapest
   * possible full-scan verification, strictly cheaper than the
   * sort-based alternatives and embarrassingly partition-parallel.
   */
  def contentFingerprint(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to fingerprint")
    val canon = cols
      .map(c => s"coalesce(CAST(`$c` AS STRING), '\u0002')")
      .mkString(", ")
    df.select(TextFns.polyHash(s"concat_ws('\u0001', $canon)").as("__h"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(
          expr(s"CAST(sum(CAST(__h AS DECIMAL(38,0))) % " +
            s"${TextFns.HashMod} AS BIGINT)"), lit(0L))
          .as("fingerprint"))
  }

  /**
   * Per-column data profile — the schema-dynamic quality census run
   * before a table is trusted: one row per profiled column with row
   * count, null count, exact distinct count, and lexicographic min/max
   * over the canonical STRING form (the contract that keeps the
   * profile engine-invariant for string/integer columns; doubles and
   * timestamps format differently across engines — quantize or
   * stringify them first, the corpus-wide rule). Emits
   * (col_name, n_rows, n_null, n_distinct, min_s, max_s).
   *
   * Scale: one NARROW pass per column — columnar formats read only
   * that column, which is exactly the profiler access pattern; each
   * pass is a map-side-combined aggregate plus one single-distinct
   * hash-aggregate (no Expand — that appears only with MULTIPLE
   * distinct aggregates in one agg). The exact distinct shuffles each
   * column's value space once; swap in [[graft.functions.KmvSketch]]
   * (the `distinct_estimate` pattern) when a column's cardinality
   * approaches corpus size.
   */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    cols.map { c =>
      df.select(col(c).cast("string").as("__v"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("__v")).as("__nn"),
          countDistinct(col("__v")).as("n_distinct"),
          min(col("__v")).as("min_s"),
          max(col("__v")).as("max_s"))
        .select(lit(c).as("col_name"), col("n_rows"),
          (col("n_rows") - col("__nn")).as("n_null"),
          col("n_distinct"), col("min_s"), col("max_s"))
    }.reduce(_ unionByName _)
  }

  /**
   * [[profileColumns]]'s cardinality column at sketch cost — the
   * 100 TB swap the exact profiler documents: per column, the KMV
   * distinct estimate ([[graft.functions.KmvSketch]], k reproducible
   * minimum polynomial hashes — deterministic, engine-recomputable)
   * over the hash-deduped canonical strings. `n_hashes` counts the
   * DISTINCT HASHES (a polynomial-hash collision merges two values —
   * the documented sketch-domain caveat, shared with
   * `distinct_estimate`). Hash-dedup runs FIRST (map-side combine) so
   * the sketch aggregates already-distinct hashes — one narrow pass +
   * one hash-space aggregate per column, ≤ k longs of state per
   * buffer. Emits (col_name, kmv_estimate, n_hashes).
   */
  /**
   * Deterministic uniform sample: the `k` rows whose reproducible id
   * hash is smallest — the mergeable sample (the k smallest of a union
   * are the k smallest of the parts' k-smallest sets, the same
   * property as the KMV sketch), so samples from shards, snapshots, or
   * micro-batches combine EXACTLY, unlike `TABLESAMPLE`/RNG sampling
   * which is partition- and run-dependent. Ties impossible on a unique
   * id; the id itself is the documented tiebreak anyway. Emits the
   * sampled rows with their `sample_hash` (callers re-merging samples
   * need it).
   *
   * Scale: top-k by hash is Spark's TakeOrdered — per-partition heaps
   * of k, one k-row merge on the driver side of the exchange; no
   * global sort.
   */
  def hashSample(df: DataFrame, idCol: String = "doc_id",
                 k: Int = 50): DataFrame = {
    require(k >= 1, "k must be >= 1")
    df.withColumn("sample_hash",
        TextFns.polyHash(s"CAST(`$idCol` AS STRING)"))
      .orderBy(col("sample_hash"), col(idCol))
      .limit(k)
  }

  /**
   * Per-group OLS trend in exact integers — the is-this-metric-drifting
   * monitor: for each group, the least-squares slope of y over x from
   * the moment sums, slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²), computed
   * entirely in DECIMAL(38,0) (exact arithmetic has no float
   * cancellation, so the textbook uncentered form is safe here) with a
   * floored micro-unit quotient. Contract: x and y are INTEGRAL
   * (pre-quantized — epoch seconds, milli-units); with epoch-seconds x
   * the n·Σx² term stays inside 38 digits to ~10⁹ rows per group —
   * rebase x (days, or minus a constant) to extend, and past the bound
   * the DECIMAL fails loudly under ANSI rather than rounding. Emits
   * one row per group: (grpCol, n, slope_den, slope_micro) —
   * slope_micro null when x is constant in the group (den = 0, no
   * trend defined) and slope_den as BIGINT via try_cast (null, not
   * garbage, past 2⁶³).
   *
   * Scale: one map-side-combined hash-aggregate to the five moment
   * sums per group — nothing downstream ever sees a fact row.
   */
  def groupedTrend(df: DataFrame, grpCol: String, xCol: String,
                   yCol: String): DataFrame =
    trendFromPartials(trendPartials(df, grpCol, xCol, yCol), grpCol)

  /** The five ADDITIVE moment sums behind [[groupedTrend]] — the
   * persistable/streamable shape (every field is a plain sum, so
   * partials from disjoint row sets merge by addition): (grpCol, n,
   * sx, sy, sxx, sxy), sums in DECIMAL(38,0). */
  def trendPartials(df: DataFrame, grpCol: String, xCol: String,
                    yCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    df.select(col(grpCol), col(xCol).cast("long").cast(dec).as("__x"),
        col(yCol).cast("long").cast(dec).as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy(grpCol)
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("__x") * col("__y")).as("sxy"))
  }

  /** [[groupedTrend]] from already-reduced [[trendPartials]] frames
   * (possibly several, unioned — the streaming fold shape): re-merge
   * by group, then the same exact slope arithmetic. */
  def trendFromPartials(partials: DataFrame, grpCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    partials
      .groupBy(grpCol)
      .agg(sum(col("n")).cast("long").as("n"),
        sum(col("sx")).as("__sx"), sum(col("sy")).as("__sy"),
        sum(col("sxx")).as("__sxx"), sum(col("sxy")).as("__sxy"))
      .withColumn("__num", expr(s"CAST(n AS $dec) * __sxy - __sx * __sy"))
      .withColumn("__den", expr(s"CAST(n AS $dec) * __sxx - __sx * __sx"))
      .select(col(grpCol), col("n"),
        expr("try_cast(__den AS BIGINT)").as("slope_den"),
        // sign-correct DECIMAL floor (the kappa_micro pattern): DIV
        // truncates toward zero, a negative slope with remainder needs
        // the -1 correction; __den > 0 here so only __num's sign matters
        when(col("__den") > 0, expr(
          """CAST(__num * 1000000 DIV __den -
            |  (CASE WHEN __num < 0 AND (__num * 1000000) % __den <> 0
            |   THEN 1 ELSE 0 END) AS BIGINT)""".stripMargin))
          .as("slope_micro"))
  }

  /**
   * Constraint (expectations) audit — the CHECK-constraint census a
   * pipeline runs before promoting a table: each named SQL predicate is
   * evaluated over every row in ONE narrow scan (all constraints share
   * the single aggregate — no per-constraint pass), and one row per
   * constraint reports the violation mass. SQL CHECK semantics: a row
   * violates only when the predicate is FALSE — a NULL predicate
   * passes, as in the standard (track null-rate with
   * [[profileColumns]], not by smuggling it into a CHECK). Emits
   * (constraint, n_rows, n_violations, violations_permille), permille
   * by truncating integer division, null on an empty frame.
   *
   * Scale: one map-side-combined aggregate over the referenced
   * columns; the long-format explode runs on the 1-row result.
   */
  def constraintAudit(df: DataFrame,
                      constraints: Seq[(String, String)]): DataFrame = {
    require(constraints.nonEmpty, "constraintAudit needs constraints")
    val aggs = count(lit(1)).as("__n") +:
      constraints.zipWithIndex.map { case ((_, sql), i) =>
        coalesce(sum(when(expr(sql) === false, 1L).otherwise(0L)), lit(0L))
          .as(s"__v$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = constraints.zipWithIndex.map { case ((name, _), i) =>
      s"'${name.replace("'", "''")}', __v$i"
    }.mkString(", ")
    one.select(expr(
        s"stack(${constraints.size}, $stacked) AS (constraint, n_violations)"),
        col("__n").as("n_rows"))
      .select(col("constraint"), col("n_rows"), col("n_violations"),
        when(col("n_rows") > 0,
          expr("n_violations * 1000 DIV n_rows")).as("violations_permille"))
  }

  def profileColumnsSketch(df: DataFrame, cols: Seq[String],
                           k: Int = 64): DataFrame = {
    require(cols.nonEmpty, "profileColumnsSketch needs at least one column")
    val kmv = graft.functions.KmvSketch.udaf(k)
    cols.map { c =>
      df.select(col(c).cast("string").as("__v"))
        .filter(col("__v").isNotNull)
        .select(TextFns.polyHash("__v").as("__h"))
        .distinct()
        .agg(kmv(col("__h")).as("kmv_estimate"),
          count(lit(1)).as("n_hashes"))
        .select(lit(c).as("col_name"), col("kmv_estimate"),
          col("n_hashes"))
    }.reduce(_ unionByName _)
  }

  /**
   * Benford first-significant-digit audit: per group, the observed
   * distribution of the leading nonzero digit of |value| against
   * Benford's law — the classic fabricated-/synthetic-data and
   * unit-mixing screen for numeric columns (a spike at one digit often
   * means a hard-coded default or a currency/unit mismatch in one
   * source). Emits one row per (grpCol, digit 1–9) present:
   * (grpCol, digit, n, permille, benford_permille, deviation_permille),
   * with the expected permille the floored `log10(1 + 1/d)·1000`
   * CONSTANTS (301, 176, 124, 96, 79, 66, 57, 51, 45) so no
   * transcendental function runs in either engine. Nulls and exact
   * zeros are excluded (no leading digit exists).
   *
   * The digit comes from the value's decimal STRING form (first [1-9]
   * match) — both plain and scientific notation lead with the first
   * significant digit, so the extraction is engine-invariant without
   * float log/divide loops.
   *
   * Scale: one narrow projection + a hash aggregate on ≤ 9 digits per
   * group, with the per-group total joined back from the same
   * aggregate — bytes per partition O(groups·9).
   */
  def benfordAudit(df: DataFrame, valCol: String = "value",
                   grpCol: String = "event_type"): DataFrame = {
    val expected = Map(1 -> 301L, 2 -> 176L, 3 -> 124L, 4 -> 96L,
      5 -> 79L, 6 -> 66L, 7 -> 57L, 8 -> 51L, 9 -> 45L)
    val exp = expected.foldLeft(lit(0L)) { case (acc, (d, p)) =>
      when(col("digit") === d, lit(p)).otherwise(acc)
    }
    val counted = df
      .filter(col(valCol).isNotNull && col(valCol) =!= 0.0)
      .withColumn("digit", expr(
        s"CAST(regexp_extract(CAST(ABS($valCol) AS STRING), '[1-9]', 0) AS BIGINT)"))
      .groupBy(col(grpCol), col("digit"))
      .agg(count(lit(1)).as("n"))
    val totals = counted.groupBy(grpCol).agg(sum("n").as("__total"))
    counted.join(totals, grpCol :: Nil)
      .withColumn("permille", expr("n * 1000 DIV __total"))
      .withColumn("benford_permille", exp)
      .withColumn("deviation_permille",
        abs(col("permille") - col("benford_permille")))
      .select(col(grpCol), col("digit"), col("n"), col("permille"),
        col("benford_permille"), col("deviation_permille"))
  }

  /**
   * Join-key skew profile: the k heaviest values of a prospective
   * shuffle key with their integer permille share of all rows — the
   * diagnostic run BEFORE a big join to decide whether [[saltedJoin]] /
   * an LSH bucket cap / AQE skew handling is needed (a key at 100‰ means
   * one reducer gets 10% of the table). Emits (keyCol, n_rows, permille,
   * rank), rank 1 = heaviest, ties broken by key value.
   *
   * Plan shape: one hash aggregate with map-side combine, a 1-row total
   * that broadcasts, and TakeOrderedAndProject for the top-k — the
   * ranking window only ever sees k rows. The permille is integer
   * division (n·1000 div total), engine-invariant.
   */
  def keySkew(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum("n_rows").cast("long").as("__total"))
    val w = Window.orderBy(col("n_rows").desc, col(keyCol).asc)
    counts.orderBy(col("n_rows").desc, col(keyCol).asc).limit(k)
      .crossJoin(broadcast(total))
      .withColumn("permille", expr("CAST(n_rows * 1000 DIV __total AS BIGINT)"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col(keyCol), col("n_rows"), col("permille"), col("rank"))
  }

  /**
   * KMV distinct-set-operation estimator (Beyer et al., "On synopses for
   * distinct-value estimation over multiset operations", SIGMOD 2007):
   * estimates the distinct-key cardinalities |A|, |B|, |A ∪ B| and
   * |A ∩ B| of two join sides from two k-minimum-values sketches — the
   * pre-join sizing pass that picks broadcast vs shuffle vs skew
   * handling WITHOUT running the join. Each side is one narrow scan
   * into a [[graft.functions.MinKLongs]] buffer (≤ k longs of state,
   * map-side combined); the estimators then run on the driver-sized
   * 1-row frames.
   *
   * The combined sketch is the k smallest of the union of the two
   * sketches; its k-th value τ estimates union density, and since τ is
   * ≤ each side's own k-th value, membership of a combined-sketch entry
   * in side sketches is exact — `K∩/k · est(|A ∪ B|)` is the paper's
   * intersection estimator. Below k distinct values everything is
   * exact. Hashes are the reproducible polynomial hash passed through a
   * universal-hash mix `(a·h + b) mod p`: a raw polynomial hash of a
   * SHORT key (a numeric id) never wraps the modulus, so raw values
   * concentrate near zero and the k-th-smallest density estimate
   * explodes; the multiply-mod mix spreads them uniformly on `[0, p)`
   * while staying bit-identical across partitionings, runs, and the
   * DuckDB twin.
   *
   * `n_exact_intersection` (a real distinct-hash join) is the eval
   * column of the sizing run, like distinct_estimate's `n_exact` — a
   * production caller drops it and pays only the two sketch scans.
   */
  def kmvOverlapEstimate(left: DataFrame, right: DataFrame,
                         leftKey: String, rightKey: String,
                         k: Int = 64): DataFrame = {
    val mod = TextFns.HashMod
    val mink = graft.functions.MinKLongs.udaf(k)
    val lh = left.select(TextFns.mixedKeyHash(leftKey).as("h"))
    val rh = right.select(TextFns.mixedKeyHash(rightKey).as("h"))
    val sa = lh.agg(mink(col("h")).as("sa"))
    val sb = rh.agg(mink(col("h")).as("sb"))
    val ex = lh.distinct().join(rh.distinct(), Seq("h"))
      .agg(count(lit(1)).as("n_exact_intersection"))
    def sideEst(arr: String): Column =
      when(expr(s"size($arr)") < k, expr(s"CAST(size($arr) AS DOUBLE)"))
        .otherwise(expr(s"CAST(${k - 1} AS DOUBLE) * $mod / element_at($arr, $k)"))
    sa.crossJoin(sb).crossJoin(ex)
      .withColumn("__unall", expr("array_sort(array_union(sa, sb))"))
      .withColumn("__un", expr(s"slice(__unall, 1, $k)"))
      .withColumn("__kint", expr(
        "CAST(size(filter(__un, h -> array_contains(sa, h) " +
          "AND array_contains(sb, h))) AS BIGINT)"))
      .withColumn("est_left", sideEst("sa"))
      .withColumn("est_right", sideEst("sb"))
      .withColumn("est_union",
        when(expr("size(__unall)") < k, expr("CAST(size(__unall) AS DOUBLE)"))
          .otherwise(expr(
            s"CAST(${k - 1} AS DOUBLE) * $mod / element_at(__un, $k)")))
      .withColumn("est_intersection",
        when(expr("size(__unall)") < k, expr("CAST(__kint AS DOUBLE)"))
          .otherwise(expr(s"CAST(__kint AS DOUBLE) * est_union / $k")))
      .select(lit(k.toLong).as("k"), col("est_left"), col("est_right"),
        col("est_union"), col("est_intersection"),
        col("n_exact_intersection"))
  }

  /**
   * Join-strategy advisor: the decision layer over the sizing passes —
   * exact per-side row counts and top-key permille shares (one
   * key-grouped aggregate per side, the [[keySkew]] top-1) folded into
   * the strategy a 100 TB join planner would pick:
   * `broadcast_right` / `broadcast_left` when a side fits the broadcast
   * budget, `salted_shuffle` when either side's heaviest key exceeds
   * `skewPermille` (a single shuffle partition would receive that share
   * of the side — the straggler AQE's skew-join provably does NOT fix
   * for LSH-style candidate joins, PLANS.md round-7), plain `shuffle`
   * otherwise. Emits ONE row: (n_left, n_right, top_share_left_permille,
   * top_share_right_permille, strategy) — all BIGINT + one string,
   * deterministic. Pair with [[kmvOverlapEstimate]] when the OUTPUT
   * size (not the input shape) is the open question.
   *
   * Scale: two key-grouped count aggregates (map-side combined) reduced
   * to 1-row frames — strictly cheaper than any join it advises on.
   */
  def joinAdvisor(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  broadcastMaxRows: Long = 1000000L,
                  skewPermille: Long = 200L): DataFrame = {
    def side(df: DataFrame, key: String) =
      df.groupBy(col(key)).agg(count(lit(1)).as("__n"))
        .agg(coalesce(sum("__n"), lit(0L)).as("rows"),
          coalesce(max("__n"), lit(0L)).as("topn"))
    side(left, leftKey)
      .select(col("rows").as("n_left"), col("topn").as("__tl"))
      .crossJoin(side(right, rightKey)
        .select(col("rows").as("n_right"), col("topn").as("__tr")))
      .withColumn("top_share_left_permille",
        when(col("n_left") > 0, expr("__tl * 1000 DIV n_left"))
          .otherwise(lit(0L)))
      .withColumn("top_share_right_permille",
        when(col("n_right") > 0, expr("__tr * 1000 DIV n_right"))
          .otherwise(lit(0L)))
      .withColumn("strategy",
        when(col("n_right") <= broadcastMaxRows, lit("broadcast_right"))
          .when(col("n_left") <= broadcastMaxRows, lit("broadcast_left"))
          .when(greatest(col("top_share_left_permille"),
            col("top_share_right_permille")) >= skewPermille,
            lit("salted_shuffle"))
          .otherwise(lit("shuffle")))
      .select("n_left", "n_right", "top_share_left_permille",
        "top_share_right_permille", "strategy")
  }
}

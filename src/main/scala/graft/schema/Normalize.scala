package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Name-driven schema normalization — the reference's core local transform
 * (reference: omnichannel_to_bq.py:64-105).
 *
 * Columns are matched case-insensitively against two hard-coded name lists
 * (omnichannel_to_bq.py:67-74, matching at :78):
 *   - INT list       -> nullable LONG via permissive parse (:82)
 *   - TIMESTAMP list -> canonical "yyyy-MM-dd HH:mm:ss" string (:89-90)
 *   - default        -> string, nulls -> "" (:96)
 *
 * The whole pass is one narrow `Project` of cast expressions (SURVEY.md
 * §2.2-P1): fully codegen'd, no shuffle, Catalyst prunes/pushes through it.
 *
 * Documented divergences from the reference (SURVEY.md §7.4):
 *   1. omnichannel_to_bq.py:96 `astype(str).fillna("")` stringifies null to
 *      "nan"/"None" before fillna can act (the fillna is dead code); we
 *      implement the evident intent: null -> "".
 *   2. omnichannel_to_bq.py:82-85 aborts the whole-column INT cast when any
 *      value is a non-integral float, leaving the column raw; we use
 *      per-value `try_cast` (null on garbage) — per-value semantics are the
 *      only ones that distribute without a pre-scan.
 *   3. Timestamps stay a real TimestampType internally when
 *      `tsAsString = false`; the canonical string form is the sink-boundary
 *      representation (BigQuery autodetect re-inferred TIMESTAMP from it
 *      anyway, omnichannel_to_bq.py:150).
 */
object Normalize {

  /** omnichannel_to_bq.py:67-70 */
  val intColumns: Set[String] = Set(
    "id", "deal_no", "requester_id", "lead_id", "customer_id", "user_id",
    "count", "so_luong", "amount", "qty", "is_active", "is_overdue")

  /** omnichannel_to_bq.py:71-74 */
  val timestampColumns: Set[String] = Set(
    "created_at", "updated_at", "created_time", "updated_time",
    "start_date", "end_date", "date", "timestamp", "closed_at")

  /** omnichannel_to_bq.py:90 strftime format, in JDK pattern syntax. */
  val canonicalTsFormat: String = "yyyy-MM-dd HH:mm:ss"

  /** The cast expression for one column, chosen by name (py:78-97). */
  def normalizeColumn(field: StructField, tsAsString: Boolean = true): Column = {
    val name  = field.name
    val c     = col(name)
    val lower = name.toLowerCase
    val out =
      if (intColumns(lower)) field.dataType match {
        case LongType                                       => c
        case ByteType | ShortType | IntegerType | BooleanType => c.cast(LongType)
        // strings/floats/decimals: permissive per-value parse, null on garbage
        case _ => expr(s"try_cast(`$name` AS BIGINT)")
      }
      else if (timestampColumns(lower)) {
        val ts = field.dataType match {
          case TimestampType                  => c
          case TimestampNTZType | DateType    => c.cast(TimestampType)
          case _                              => try_to_timestamp(c)
        }
        if (tsAsString) date_format(ts, canonicalTsFormat) else ts
      }
      else field.dataType match {
        case StringType => coalesce(c, lit(""))
        case _          => coalesce(c.cast(StringType), lit(""))
      }
    out.as(name)
  }

  /** Normalize every column of `df` by the name rules — one Project. */
  def normalize(df: DataFrame, tsAsString: Boolean = true): DataFrame =
    df.select(df.schema.fields.map(f => normalizeColumn(f, tsAsString)).toSeq: _*)
}

package graft.sources.rest

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Convenience wrappers over [[PaginatedJsonSource]].
 *
 * `read` returns the raw one-JSON-object-per-row frame; `readJson`
 * materializes it to a typed table via Spark's JSON inference — the
 * union-of-keys / missing-keys-null semantics of `pd.DataFrame(all_objs)`
 * (reference: omnichannel_to_bq.py:48,61; SURVEY.md §2.1-S4). Ragged pages
 * (different key sets per page) land as one wide schema with nulls, which
 * is exactly the reference behavior.
 */
object RestIngest {

  def read(spark: SparkSession, options: Map[String, String]): DataFrame =
    spark.read.format(classOf[PaginatedJsonSource].getName)
      .options(options).load()

  def readJson(spark: SparkSession, options: Map[String, String]): DataFrame = {
    import spark.implicits._
    spark.read.json(read(spark, options).as[String])
  }
}

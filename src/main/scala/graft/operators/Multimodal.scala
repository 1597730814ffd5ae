package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: media payloads travel as opaque `BINARY`
 * columns with typed metadata alongside. The Spark-side shape — schema,
 * partition-parallel batch decode, deterministic metadata — is real; the
 * actual codec step is a clearly-marked deterministic STUB because no
 * image/audio libraries ship in this environment.
 *
 * At 100 TB the decode runs as `mapPartitions` over the binary column
 * (executor-parallel, one codec context per partition, no driver
 * involvement); swapping the stub for a real decoder changes one function.
 */
object Multimodal {

  /** Typed decode result carried next to the payload. */
  case class MediaMeta(doc_id: Long, byte_len: Long, width: Long, height: Long,
                       channels: Long, checksum: String)

  /** Attach a binary payload column (UTF-8 bytes of `text` stand in for a
   * real media blob in fixtures). */
  def withPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("payload", encode(col(textCol), "UTF-8"))

  /**
   * Pure-expression metadata over the binary column: byte length, SHA-256
   * checksum, and a deterministic fake decode (dimensions derived from the
   * byte length). Fully codegen'd, no UDF — this is the path the SQL oracle
   * verifies.
   */
  def payloadMeta(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    withPayload(docs).select(
      col(idCol),
      octet_length(col("payload")).cast("long").as("byte_len"),
      sha2(col("payload"), 256).as("checksum"),
      (octet_length(col("payload")) % 640 + 1).cast("long").as("width"),
      (octet_length(col("payload")) % 480 + 1).cast("long").as("height"),
      lit(3L).as("channels"))

  /**
   * Resize planning + frame sampling over the payload — the two remaining
   * media transforms of a training pipeline, as pure expressions. The
   * "native" dimensions are the deterministic stub of [[payloadMeta]]; the
   * real outputs of this operator (scale factors, sampled byte offsets)
   * are the plumbing a codec-backed implementation feeds its decoder:
   *   - scale_x / scale_y: target-over-native ratios a resize kernel uses;
   *   - n_frames / frame_offsets: byte positions sampled every `frameStride`
   *     bytes (stands in for per-frame seek offsets; empty for empty
   *     payloads). Offsets are emitted as a comma-joined string so the
   *     result stays scalar-typed end to end (sortable/hashable by any
   *     downstream comparator or sink without array support).
   */
  def mediaOps(docs: DataFrame, idCol: String = "doc_id",
               targetW: Int = 224, targetH: Int = 224,
               frameStride: Int = 64): DataFrame =
    withPayload(docs).select(
      col(idCol),
      octet_length(col("payload")).cast("long").as("byte_len"),
      (octet_length(col("payload")) % 640 + 1).cast("long").as("width"),
      (octet_length(col("payload")) % 480 + 1).cast("long").as("height"))
      .withColumn("scale_x",
        round(lit(targetW.toDouble) / col("width").cast("double"), 6))
      .withColumn("scale_y",
        round(lit(targetH.toDouble) / col("height").cast("double"), 6))
      .withColumn("n_frames", expr(
        s"CAST(CASE WHEN byte_len > 0 THEN 1 + (byte_len - 1) DIV $frameStride " +
          "ELSE 0 END AS BIGINT)"))
      .withColumn("frame_offsets", expr(
        s"""CASE WHEN byte_len > 0
           |  THEN array_join(transform(
           |    sequence(CAST(0 AS BIGINT), byte_len - 1, CAST($frameStride AS BIGINT)),
           |    x -> CAST(x AS STRING)), ',')
           |  ELSE '' END""".stripMargin))

  /** Typed feature row: per-payload histogram features. `hist_counts`
   * carries the raw per-bin byte counts next to the normalized frequencies
   * so downstream checks (and the SQL oracle) can stay integer-exact. */
  case class MediaFeatures(doc_id: Long, byte_len: Long,
                           histogram: Array[Float], hist_counts: Array[Long],
                           peak_bin: Int)

  /**
   * Feature extraction over the binary payload — REAL (not stubbed):
   * a 16-bin byte histogram normalized to frequencies plus the densest
   * bin, the kind of cheap content signature used for media dedup
   * pre-filters and corruption screens. Same `mapPartitions` shape as
   * [[decodeBatch]] (per-partition batch loop, no driver involvement);
   * a codec-backed pipeline swaps the byte loop for decoded-sample
   * features without touching the plumbing.
   */
  def featureExtractBatch(spark: SparkSession, docs: DataFrame,
                          idCol: String = "doc_id"): Dataset[MediaFeatures] = {
    import spark.implicits._
    withPayload(docs)
      .select(col(idCol).cast("long").as("id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val counts = new Array[Long](16)
          var i = 0
          while (i < bytes.length) {
            counts((bytes(i) & 0xff) >>> 4) += 1
            i += 1
          }
          val n = math.max(bytes.length, 1).toFloat
          val hist = counts.map(c => c / n)
          val peak = counts.indices.maxBy(i => (counts(i), -i))
          MediaFeatures(id, bytes.length.toLong, hist, counts, peak)
        }
      }
  }

  /**
   * Batch decode via `mapPartitions` — the shape a real codec integration
   * uses (amortizes per-partition codec init across rows). The decode body
   * is a STUB: deterministic dimensions from the payload bytes instead of a
   * real image parse.
   */
  def decodeBatch(spark: SparkSession, docs: DataFrame,
                  idCol: String = "doc_id"): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload(docs)
      .select(col(idCol).cast("long").as("id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real integration: init codec context here, once per partition
        rows.map { case (id, bytes) =>
          // STUB decode: dimensions/checksum derived deterministically
          val digest = java.security.MessageDigest.getInstance("SHA-256")
          val hex = digest.digest(bytes).map("%02x".format(_)).mkString
          MediaMeta(id, bytes.length.toLong,
            width = bytes.length % 640 + 1L, height = bytes.length % 480 + 1L,
            channels = 3L, checksum = hex)
        }
      }
  }

  /**
   * Cheap-feature media dedup BEFORE any codec: group binary payloads by
   * a quantized byte-histogram fingerprint — each bin's count reduced to
   * integer permille of the payload length — plus the power-of-two
   * length bucket, and keep the lowest id per group. Re-saved/trivially
   * re-encoded copies collapse; with a real decoder the same plan runs
   * on perceptual hashes. (A cosine-pair formulation was measured first:
   * same-language TEXT payloads all have near-identical byte histograms,
   * so ≥0.995 cosine emitted 37k of 125k possible pairs at sf0.01 —
   * a quadratic answer carrying no signal. Exact quantized-fingerprint
   * grouping is the formulation whose output stays LINEAR in the corpus
   * by construction.)
   *
   * Emits (idCol, fp, n_same, keep). One hash aggregate over the
   * fingerprint string + a window within fingerprint groups — no pair
   * join anywhere; permille arithmetic is BIGINT floor division, so the
   * fingerprint is engine-exact.
   */
  def mediaFingerprintDedup(spark: SparkSession, docs: DataFrame,
                            idCol: String = "doc_id"): DataFrame = {
    val f = featureExtractBatch(spark, docs, idCol).toDF()
      .select(col("doc_id"), col("byte_len"), col("hist_counts").as("h"))
      .withColumn("fp", concat(
        length(bin(col("byte_len"))).cast("string"), lit(":"),
        expr("""array_join(transform(h,
                |  c -> CAST(CASE WHEN byte_len > 0
                |            THEN (c * 1000) DIV byte_len ELSE 0 END AS STRING)),
                |  ',')""".stripMargin)))
    val w = Window.partitionBy("fp")
    f.withColumn("n_same", count(lit(1)).over(w).cast("long"))
      .withColumn("keep", col("doc_id") === min("doc_id").over(w))
      .select(col("doc_id").as(idCol), col("fp"), col("n_same"), col("keep"))
  }
}

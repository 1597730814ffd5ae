package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq((1L, "hello"), (2L, "")).toDF("doc_id", "text")

  test("payloadMeta: byte length, sha-256, deterministic fake dimensions") {
    val out = rows(Multimodal.payloadMeta(docs).orderBy("doc_id"))
    assert(out(0) == Seq(1L, 5L,
      "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824",
      6L, 6L, 3L))
    assert(out(1)(1) == 0L)
  }

  test("featureExtractBatch: 16-bin byte histogram sums to 1, peak correct") {
    // "hello" = 0x68 65 6c 6c 6f -> all five bytes in bin 6
    val out = Multimodal.featureExtractBatch(spark, docs)
      .collect().sortBy(_.doc_id)
    assert(out(0).histogram(6) == 1.0f && out(0).peak_bin == 6)
    assert(math.abs(out(0).histogram.sum - 1.0f) < 1e-6)
    assert(out(1).byte_len == 0L && out(1).histogram.forall(_ == 0.0f))
    assert(out(1).peak_bin == 0) // ties break to the lowest bin
  }

  test("imagePayload emits genuine PNG bytes (magic + ImageIO-decodable)") {
    val png = Multimodal.imagePayload(spark, docs)
      .orderBy("doc_id").collect()
    val magic = Array(0x89, 'P', 'N', 'G').map(_.toByte)
    png.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("payload")
      assert(bytes.take(4).sameElements(magic))
      assert(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)) != null)
    }
  }

  test("decodeBatch: decoded raster matches the closed-form pattern") {
    // doc 1: w = 16 + 1 % 17 = 17, h = 16 + 1 % 13 = 17, blue = 1
    val out = Multimodal.decodeBatch(spark, docs)
      .collect().sortBy(_.doc_id)
    val d1 = out(0)
    assert(d1.width == 17L && d1.height == 17L && d1.channels == 3L)
    assert(d1.n_pixels == 17L * 17)
    assert(d1.sum_r == 17L * (17 * 16 / 2))   // h * sum(x)
    assert(d1.sum_g == 17L * (17 * 16 / 2))   // w * sum(y)
    assert(d1.sum_b == 17L * 17 * 1)          // w * h * (id % 256)
    // doc 2: w = 18, h = 18, blue = 2
    val d2 = out(1)
    assert(d2.width == 18L && d2.height == 18L)
    assert(d2.sum_r == 18L * (18 * 17 / 2) && d2.sum_b == 18L * 18 * 2)
  }

  test("mediaFingerprintDedup: identical payloads group, lowest id kept") {
    import spark.implicits._
    val d = Seq(
      (1L, "same payload bytes"),
      (2L, "same payload bytes"),     // exact copy of 1 -> same group
      (3L, "completely different content with other lengths"))
      .toDF("doc_id", "text")
    val out = rows(Multimodal.mediaFingerprintDedup(spark, d)
      .orderBy("doc_id"))
    assert(out.map(r => (r(0), r(2), r(3))) == Seq(
      (1L, 2L, true), (2L, 2L, false), (3L, 1L, true)))
    // fingerprints of the copies are equal, the outsider's differs
    assert(out(0)(1) == out(1)(1) && out(0)(1) != out(2)(1))
  }

  test("resizeBatch: resampled channel sums match the closed form for " +
      "up- and down-sampled sources") {
    import spark.implicits._
    // id 1 -> 17x17 (upsample to 24), id 16 -> 32x19 (downsample width,
    // upsample height), id 300 -> 21x19 with blue 300 % 256 = 44
    val docs = Seq(1L, 16L, 300L).toDF("doc_id")
    val out = rows(Multimodal.resizeBatch(spark, docs).toDF()
      .orderBy("doc_id"))
    def expect(id: Long): Seq[Any] = {
      val w = 16 + (id % 17); val h = 16 + (id % 13)
      val sr = 24 * (0 until 24).map(tx => tx * w / 24).sum
      val sg = 24 * (0 until 24).map(ty => ty * h / 24).sum
      Seq(id, w, h, 24L, 24L, 576L, sr, sg, 576 * (id % 256))
    }
    assert(out == Seq(1L, 16L, 300L).map(expect))
    // non-square target: dimensions land where asked
    val nq = rows(Multimodal.resizeBatch(spark, Seq(1L).toDF("doc_id"),
      targetW = 8, targetH = 30).toDF())
    assert(nq.head(3) == 8L && nq.head(4) == 30L && nq.head(5) == 240L)
  }
}

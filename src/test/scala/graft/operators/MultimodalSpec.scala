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

  test("decodeBatch (mapPartitions stub) agrees with the expression path") {
    val exprPath = rows(Multimodal.payloadMeta(docs)
      .select("doc_id", "byte_len", "checksum").orderBy("doc_id"))
    val mpPath = rows(Multimodal.decodeBatch(spark, docs).toDF()
      .select("doc_id", "byte_len", "checksum").orderBy("doc_id"))
    assert(exprPath == mpPath)
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
}

package graft

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSpecBase {

  test("decode stub is deterministic and length-derived") {
    val payload = "hello world".getBytes("UTF-8")
    val (w1, h1, f1, c1) = Multimodal.decodeStub(payload)
    val (w2, _, _, c2) = Multimodal.decodeStub(payload)
    assert(w1 === w2 && c1 === c2)
    assert(w1 === 64 + payload.length % 256)
    assert(h1 === 64 + (payload.length * 7) % 256)
    assert(f1 === 1 + payload.length % 8)
  }

  test("media dedup collapses byte-identical payloads across modality tags") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Ids 1 and 2 carry identical bytes but different modality tags
    // (1%3 vs 2%3) — content addressing must still collapse them.
    val docs = Seq((1L, "same bytes"), (2L, "same bytes"), (5L, "different"))
      .toDF("doc_id", "text")
    val out = Multimodal.mediaDedup(Multimodal.asMediaTable(docs))
      .collect().map(r => r.getAs[Long]("kept_doc_id") ->
        r.getAs[Long]("n_copies")).toMap
    assert(out === Map(1L -> 2L, 5L -> 1L))
  }

  test("media table + mapPartitions feature extraction preserves rows and modality split") {
    val docs = Tables.documents(spark, Sf)
    val media = Multimodal.asMediaTable(docs)
    val features = Multimodal.extractFeatures(spark, media)
    assert(features.count() === docs.count())
    val stats = Multimodal.modalityStats(features).collect()
    assert(stats.map(_.getAs[String]("modality")).toSet === Set("image", "audio", "video"))
    assert(stats.map(_.getAs[Long]("n_docs")).sum === docs.count())
    // width is 64 + len%256, so per-doc width within [64, 319]
    stats.foreach { r =>
      val n = r.getAs[Long]("n_docs"); val sw = r.getAs[Long]("sum_width")
      assert(sw >= 64 * n && sw <= 319 * n)
    }
  }

  test("perceptual dedup: identical payloads at Hamming 0, tiny suffix within radius, unrelated apart") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // ~330-char base: step stays constant under a 1-char edit, and the
    // edit sits inside a covered pixel window, so it flips at most one
    // signature bit (one window hash changes; the mean can only move
    // the threshold, and here it doesn't — asserted via radius).
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = base.replace("tok30", "tok3x")
    val other = (1 to 60).map(i => s"zeb${(i * 7) % 100}").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base), (3L, near), (4L, other)
    ).toDF("doc_id", "text")
    val out = Multimodal.perceptualDedup(Multimodal.asMediaTable(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out((1L, 2L)) === 0)
    assert(out.contains((1L, 3L)) && out((1L, 3L)) <= 3)
    assert(!out.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }
}

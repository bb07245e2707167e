package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.fakeMediaFromText(
    Tables(spark, "/root/testdata/sf0.001").documents.limit(20), "doc_id", "text")

  test("media schema round-trips blob + typed meta") {
    val s = media.schema
    assert(s("blob").dataType.typeName == "binary")
    assert(s("meta").dataType.typeName == "struct")
  }

  test("batched feature extraction: 16-dim L1-normalized features, blob dropped") {
    val out = Multimodal.extractFeatures(media, batchSize = 8)
    assert(!out.columns.contains("blob"))
    val rows = out.select("media_id", "features", "n_bytes").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val f = r.getAs[scala.collection.Seq[Float]]("features")
      assert(f.length == 16)
      assert(math.abs(f.sum - 1.0f) < 1e-3, s"features should be L1-normalized, got ${f.sum}")
    }
  }

  test("feature extraction is deterministic") {
    val a = Multimodal.extractFeatures(media).select("media_id", "features")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = Multimodal.extractFeatures(media).select("media_id", "features")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a == b)
  }

  test("frame sampling emits one feature row per frame") {
    val out = Multimodal.sampleFrames(media, frames = 4)
    assert(out.count() == 80)
    assert(out.select("frame_idx").distinct().count() == 4)
  }
}

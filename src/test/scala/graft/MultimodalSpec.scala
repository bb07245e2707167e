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

  test("imageMeta parses real PNG/JPEG/GIF/BMP headers from raw bytes") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(24)
      b.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
      b.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
      b.array()
    }
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(30)
      b.put(Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte)).putShort(16.toShort)
      b.put(new Array[Byte](14)) // APP0 payload
      b.put(Array(0xFF, 0xC0).map(_.toByte)).putShort(17.toShort)
      b.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
      b.array()
    }
    def gif(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(10).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("GIF89a".getBytes).putShort(w.toShort).putShort(h.toShort)
      b.array()
    }
    def bmp(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(26).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("BM".getBytes).put(new Array[Byte](16)).putInt(w).putInt(-h) // top-down BMP
      b.array()
    }
    val rows = Seq(
      (1L, png(640, 480)), (2L, jpeg(200, 100)), (3L, gif(32, 16)),
      (4L, bmp(64, 48)), (5L, "not an image".getBytes))
    val got = rows.toDF("id", "blob")
      .select(col("id"), Multimodal.imageMeta(col("blob")).as("m"))
      .select("id", "m.format", "m.width", "m.height")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2), if (r.isNullAt(3)) -1 else r.getInt(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "png", 640, 480), (2L, "jpeg", 200, 100), (3L, "gif", 32, 16),
      (4L, "bmp", 64, 48), (5L, "unknown", -1, -1)))
  }
}

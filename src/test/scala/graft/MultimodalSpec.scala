package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal
import graft.ops.Multimodal.MediaFile

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def media(rows: (Long, String, String)*) = {
    import spark.implicits._
    spark.createDataset(rows.map { case (id, kind, s) =>
      MediaFile(id, kind, s.getBytes("UTF-8")) })(Multimodal.mediaFileEnc)
  }

  test("extractMeta: deterministic stub dims, magic header, checksum") {
    val out = Multimodal.extractMeta(media((1L, "image", "PNGx-data"), (2L, "video", "AVI!....")))
      .collect().sortBy(_.media_id)
    val img = out(0)
    assert(img.n_bytes == 9 && img.header_hex == "504E4778") // "PNGx"
    assert(img.width == 64 + 'P'.toInt % 64 && img.height == 64 + 'N'.toInt % 64)
    assert(img.duration_ms == 0L)
    assert(img.checksum.length == 32)
    val vid = out(1)
    assert(vid.duration_ms == 8L) // stub: video duration = byte length
  }

  test("sampleFrames: chunked frame rows for video only, everyNth kept") {
    val out = Multimodal.sampleFrames(
      media((1L, "video", "a" * 10), (2L, "image", "b" * 10)),
      frameBytes = 3, everyNth = 2).collect().sortBy(_.frame_idx)
    // 10 bytes / 3 = 4 frames (0,1,2,3); keep 0 and 2
    assert(out.map(f => (f.media_id, f.frame_idx, f.byte_offset, f.n_bytes)).toSeq ==
      Seq((1L, 0, 0L, 3), (1L, 2, 6L, 3)))
  }

  test("resize truncates content, preserves ids") {
    val out = Multimodal.resize(media((1L, "image", "abcdefgh")), maxBytes = 4)
      .collect().head
    assert(new String(out.content, "UTF-8") == "abcd" && out.media_id == 1L)
  }
}

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

  private def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => img.setRGB(x, 0, 0x3366cc))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("ImageIoCodec decodes REAL PNG/JPEG dimensions through the full pipeline") {
    import spark.implicits._
    val png = encode("png", 17, 23)
    val jpg = encode("jpg", 31, 5)
    val ds = spark.createDataset(Seq(
      MediaFile(1L, "image", png), MediaFile(2L, "image", jpg),
      // unrecognizable bytes: deterministic stub fallback, no exception
      MediaFile(3L, "image", "PNGx-data".getBytes("UTF-8"))))(
      Multimodal.mediaFileEnc)
    val out = Multimodal.extractMeta(ds).collect().sortBy(_.media_id)
    assert((out(0).width, out(0).height) == (17, 23))
    assert(out(0).header_hex == "89504E47") // real PNG magic
    assert((out(1).width, out(1).height) == (31, 5))
    assert((out(2).width, out(2).height) ==
      (64 + 'P'.toInt % 64, 64 + 'N'.toInt % 64)) // stub fallback
  }

  /** Canonical 44-byte-header WAV with the given fmt parameters. */
  private def wav(rate: Int, channels: Int, dataBytes: Int): Array[Byte] = {
    val byteRate = rate * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1)
      .putShort(channels.toShort).putInt(rate).putInt(byteRate)
      .putShort((channels * 2).toShort).putShort(16)
    bb.put("data".getBytes).putInt(dataBytes)
    bb.array()
  }

  test("imageHashes: REAL pixel aHash clusters near-identical PNGs; unrelated images far; stub = md5 prefix") {
    import java.awt.image.BufferedImage
    def gradient(flip: Boolean, noise: Boolean): Array[Byte] = {
      val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val v = if (flip) 255 - x * 8 % 256 else x * 8 % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      // noise: nudge one 4x4 corner block slightly — a near-dup, not a copy
      if (noise) for (y <- 0 until 4; x <- 0 until 4)
        img.setRGB(x, y, img.getRGB(x, y) ^ 0x060606)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val garbage = "not-an-image".getBytes("UTF-8")
    val ds = spark.createDataset(Seq(
      MediaFile(1L, "image", gradient(flip = false, noise = false)),
      MediaFile(2L, "image", gradient(flip = false, noise = true)),
      MediaFile(3L, "image", gradient(flip = true, noise = false)),
      MediaFile(4L, "image", garbage),
      MediaFile(5L, "audio", garbage) // non-image kind: filtered out
    ))(Multimodal.mediaFileEnc)
    val h = Multimodal.imageHashes(ds).collect()
      .map(m => m.media_id -> m.ahash).toMap
    assert(h.keySet == Set(1L, 2L, 3L, 4L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // near-identical: tiny Hamming distance (but content bytes differ)
    assert(ham(h(1L), h(2L)) <= 4, s"near-dup distance ${ham(h(1L), h(2L))}")
    // flipped gradient: bright/dark blocks swap => far
    assert(ham(h(1L), h(3L)) >= 24, s"unrelated distance ${ham(h(1L), h(3L))}")
    // undecodable bytes: the 60-bit md5-prefix stand-in, bit-exact
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(garbage).map(b => f"${b & 0xff}%02x").mkString
    assert(h(4L) == java.lang.Long.parseLong(md5.substring(0, 15), 16))
  }

  test("ImageIoCodec parses REAL WAV fmt-chunk metadata; non-WAV falls back to stub") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      MediaFile(1L, "audio", wav(rate = 44100, channels = 2, dataBytes = 44100 * 2 * 2)),
      MediaFile(2L, "audio", "ABCD-noise".getBytes("UTF-8"))))(
      Multimodal.mediaFileEnc)
    val out = Multimodal.extractAudioMeta(ds).collect().sortBy(_.media_id)
    assert((out(0).sample_rate, out(0).channels, out(0).duration_ms) ==
      (44100, 2, 1000L)) // 1 second of 16-bit stereo
    val stub = Multimodal.StubCodec.decodeAudio("ABCD-noise".getBytes("UTF-8"))
    assert((out(1).sample_rate, out(1).channels, out(1).duration_ms) == stub)
  }
}

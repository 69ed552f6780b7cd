package graft.multimodal

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", Multimodal.mediaMetaType)))

  private def df(rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

  private val bytes = Array.tabulate(40)(i => (i % 7).toByte)

  test("extractFeatures: byte stats appended; NULL payload → NULL struct") {
    val d = df(
      Row(1L, bytes, Row("img", 8, 5, 1)),
      Row(2L, null, Row("img", 0, 0, 0)))
    val out = Multimodal.extractFeatures(d, "payload", "feat").orderBy("id").collect()
    val f = out(0).getStruct(3)
    assert(f.getInt(0) == 40)
    assert(math.abs(f.getDouble(1) - bytes.map(_ & 0xff).sum / 40.0) < 1e-9)
    assert(f.getDouble(2) > 0.0 && f.getDouble(2) <= 8.0) // entropy bits
    assert(out(1).isNullAt(3))
  }

  test("extractFeatures entropy: uniform bytes = 0, varied bytes > 0") {
    val flat = Array.fill(16)(7.toByte)
    val d = df(Row(1L, flat, Row("img", 4, 4, 1)))
    val f = Multimodal.extractFeatures(d, "payload", "feat").head.getStruct(3)
    assert(f.getDouble(2) == 0.0)
  }

  test("sampleFrames: stride slicing, one row per kept frame, full coverage at stride 1") {
    val payload = Array.tabulate(40)(_.toByte) // 4 frames × 10 bytes
    val d = df(Row(1L, payload, Row("vid", 8, 5, 4)))
    val all = Multimodal.sampleFrames(d, "payload", "meta", 1).orderBy("frame_idx").collect()
    assert(all.map(_.getInt(3)).toSeq == Seq(0, 1, 2, 3))
    assert(all.flatMap(_.getAs[Array[Byte]](4)).toSeq == payload.toSeq) // no byte lost
    val strided = Multimodal.sampleFrames(d, "payload", "meta", 2).collect()
    assert(strided.map(_.getInt(3)).toSet == Set(0, 2))
  }

  test("sampleFrames: NULL payload or zero frames emit nothing") {
    val d = df(
      Row(1L, null, Row("vid", 1, 1, 4)),
      Row(2L, bytes, Row("vid", 1, 1, 0)))
    assert(Multimodal.sampleFrames(d, "payload", "meta", 1).count() == 0)
  }

  test("resize: byte downsample + metadata rewrite, NULL passthrough") {
    val payload = Array.tabulate(16)(_.toByte)
    val d = df(
      Row(1L, payload, Row("img", 8, 4, 1)),
      Row(2L, null, Row("img", 8, 4, 1)))
    val out = Multimodal.resize(d, "payload", "meta", 2).orderBy("id").collect()
    assert(out(0).getAs[Array[Byte]](1).toSeq == Seq[Byte](0, 2, 4, 6, 8, 10, 12, 14))
    val m = out(0).getStruct(2)
    assert(m.getInt(1) == 4 && m.getInt(2) == 2) // width/height halved
    assert(out(1).isNullAt(1)) // NULL payload untouched
  }

  test("decodeImage: lossless gray-PNG round trip through the real codec") {
    val px = Array.tabulate(3, 5)((y, x) => (x * 40 + y * 7) % 256)
    val Some((w, h, c, luma)) = Multimodal.decodeImage(Multimodal.encodeGrayPng(px))
    assert((w, h, c) == (5, 3, 1))
    val expected = px.flatten.sum.toDouble / 15
    assert(luma == expected) // integer sums are exact in double
  }

  test("decodeImage: RGB JPEG decodes with 3 bands and true dims") {
    val img = new java.awt.image.BufferedImage(
      7, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 7) img.setRGB(x, y, (x * 30 << 16) | (y * 60 << 8) | 128)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val Some((w, h, c, luma)) = Multimodal.decodeImage(out.toByteArray)
    assert((w, h, c) == (7, 4, 3))
    assert(luma >= 0.0 && luma <= 255.0) // JPEG is lossy; only range-check
  }

  test("thumbnailGray: exact nearest-neighbor sampling on a known raster") {
    // 4×2 source, downsample to 2×2: samples at x∈{0,2}, y∈{0,1}.
    val px = Array(Array(10, 20, 30, 40), Array(50, 60, 70, 80))
    val Some((tw, th, sum)) =
      Multimodal.thumbnailGray(Multimodal.encodeGrayPng(px), nw = 2, nh = 2)
    assert((tw, th) == (2, 2))
    assert(sum == (10 + 30 + 50 + 70).toDouble)
  }

  test("thumbnailGray: identity when dims match; None on garbage") {
    val px = Array(Array(1, 2), Array(3, 4))
    val Some((_, _, sum)) =
      Multimodal.thumbnailGray(Multimodal.encodeGrayPng(px), 2, 2)
    assert(sum == 10.0)
    assert(Multimodal.thumbnailGray("junk".getBytes, 2, 2).isEmpty)
    assert(Multimodal.thumbnailGray(null, 2, 2).isEmpty)
  }

  test("decodeImage: garbage, empty, and null payloads → None") {
    assert(Multimodal.decodeImage("not a png".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
  }

  test("extractImageFeatures: NULL struct for undecodable rows, real stats otherwise") {
    val png = Multimodal.encodeGrayPng(Array.fill(2, 2)(100))
    val d = df(Row(1L, png, Row("img", 2, 2, 1)), Row(2L, "junk".getBytes, Row("img", 0, 0, 1)))
    val out = Multimodal.extractImageFeatures(d, "payload", "img").orderBy("id").collect()
    val f = out(0).getStruct(3)
    assert(f.getInt(0) == 2 && f.getInt(1) == 2 && f.getInt(2) == 1 && f.getDouble(3) == 100.0)
    assert(out(1).isNullAt(3))
  }

  test("decodeAudio: planted stereo square wave round-trips exactly through WAV") {
    // even-length ±A square wave: RMS = A/32768 exactly (powers of 2)
    val n = 400
    val a0: Short = 12000
    val a1: Short = 3000
    def sq(a: Short) = Array.tabulate[Short](n)(i => if (i % 2 == 0) a else (-a).toShort)
    val wav = Multimodal.encodeWavPcm16(Array(sq(a0), sq(a1)), 16000)
    val Some((rate, ch, frames, dur, rms)) = Multimodal.decodeAudio(wav)
    assert((rate, ch, frames) == (16000, 2, n.toLong))
    assert(dur == n.toDouble / 16000)
    assert(rms.toSeq == Seq(a0 / 32768.0, a1 / 32768.0))
  }

  test("decodeAudio: DC (constant) mono signal has RMS = |level|") {
    val level: Short = -8192
    val wav = Multimodal.encodeWavPcm16(Array(Array.fill[Short](100)(level)), 8000)
    val Some((rate, ch, frames, _, rms)) = Multimodal.decodeAudio(wav)
    assert((rate, ch, frames) == (8000, 1, 100L))
    assert(rms.toSeq == Seq(8192 / 32768.0))
  }

  test("decodeAudio: big-endian PCM via the AIFF container") {
    val n = 200
    val a: Short = 6000
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = if (i % 2 == 0) a else (-a).toShort
      pcm(i * 2) = ((s >> 8) & 0xff).toByte // big-endian
      pcm(i * 2 + 1) = (s & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.AIFF, out)
    val Some((rate, ch, frames, _, rms)) = Multimodal.decodeAudio(out.toByteArray)
    assert((rate, ch, frames) == (8000, 1, n.toLong))
    assert(rms.toSeq == Seq(a / 32768.0))
  }

  test("decodeAudio: garbage, empty, and null payloads → None") {
    assert(Multimodal.decodeAudio("not a wav".getBytes).isEmpty)
    assert(Multimodal.decodeAudio(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeAudio(null).isEmpty)
  }

  test("extractAudioFeatures: NULL struct for undecodable rows, real stats otherwise") {
    val wav = Multimodal.encodeWavPcm16(
      Array(Array.tabulate[Short](50)(i => if (i % 2 == 0) 4096 else -4096)), 8000)
    val d = df(Row(1L, wav, Row("wav", 0, 0, 1)), Row(2L, "junk".getBytes, Row("wav", 0, 0, 1)))
    val out = Multimodal.extractAudioFeatures(d, "payload", "au").orderBy("id").collect()
    val f = out(0).getStruct(3)
    assert(f.getInt(0) == 8000 && f.getInt(1) == 1 && f.getLong(2) == 50L)
    assert(f.getSeq[Double](4) == Seq(4096 / 32768.0))
    assert(out(1).isNullAt(3))
  }

  test("decodePcm16 recovers the exact planted samples (both endiannesses)") {
    val samples = Array.tabulate[Short](64)(i => ((i * 523) % 20001 - 10000).toShort)
    val wav = Multimodal.encodeWavPcm16(Array(samples), 8000)
    val Some((rate, chans)) = Multimodal.decodePcm16(wav)
    assert(rate == 8000 && chans.length == 1)
    assert(chans(0).toSeq == samples.toSeq)
    assert(Multimodal.decodePcm16("junk".getBytes).isEmpty)
    assert(Multimodal.decodePcm16(Array.emptyByteArray).isEmpty)
  }

  test("resampleNearest: identity at equal rates; exact index floors on downsample") {
    val s = Array.tabulate[Short](10)(i => (i * 100).toShort)
    assert(Multimodal.resampleNearest(Array(s), 8000, 8000)(0).toSeq == s.toSeq)
    // 10 frames 8000→5000: dst = 6, indices ⌊i·8/5⌋ = 0,1,3,4,6,8
    val down = Multimodal.resampleNearest(Array(s), 8000, 5000)(0)
    assert(down.toSeq == Seq(0, 100, 300, 400, 600, 800).map(_.toShort))
    // upsample 5000→8000 of the 6: dst = 9, indices ⌊i·5/8⌋
    val up = Multimodal.resampleNearest(Array(down), 5000, 8000)(0)
    assert(up.toSeq == (0 until 9).map(i => down(i * 5 / 8)).toSeq)
  }

  test("resampleAudioFeatures: codec-loop stats equal direct resample; NULL quarantine") {
    val samples = Array.tabulate[Short](80)(i => ((i * 37) % 401 - 200).toShort)
    val wav = Multimodal.encodeWavPcm16(Array(samples), 8000)
    val d = df(Row(1L, wav, Row("wav", 0, 0, 1)), Row(2L, "junk".getBytes, Row("wav", 0, 0, 1)))
    val out = Multimodal.resampleAudioFeatures(d, "payload", 5000, "rs")
      .orderBy("id").collect()
    val f = out(0).getStruct(3)
    val direct = Multimodal.resampleNearest(Array(samples), 8000, 5000)(0)
    assert(f.getLong(0) == 80L && f.getLong(1) == direct.length.toLong)
    assert(f.getSeq[Long](2) == Seq(direct.map(s => s.toLong * s).sum))
    assert(out(1).isNullAt(3))
  }
}

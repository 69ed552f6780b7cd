package graft.multimodal

import graft.SparkSpec

class AudioDedupSpec extends SparkSpec {

  private def wave(mul: Int, amp: Int, n: Int): Array[Short] =
    Array.tabulate[Short](n)(i => (((i * mul + 7) % 401 - 200) * amp).toShort)

  test("gain-scaled copies collapse to one hash; different shapes do not") {
    val a1 = AudioDedup.energyHash(wave(37, 40, 300))
    val a2 = AudioDedup.energyHash(wave(37, 110, 300)) // same shape, louder
    val b = AudioDedup.energyHash(wave(53, 40, 300)) // different shape
    assert(a1 == a2)
    assert(a1 != b)
  }

  test("hash survives the real WAV codec round trip") {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val samples = wave(41, 60, 250)
    val direct = AudioDedup.energyHash(samples)
    val enc = Encoders.row(StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType))))
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, Multimodal.encodeWavPcm16(Array(samples), 8000))),
      StructType(Seq(StructField("id", LongType),
        StructField("payload", BinaryType))))
    val viaCodec = AudioDedup.audioHashes(df, "payload", "id")
      .collect().head.getLong(1)
    assert(viaCodec == direct)
  }

  test("undecodable payloads are quarantined out, not hashed") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("payload", BinaryType)))
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1L, Multimodal.encodeWavPcm16(Array(wave(37, 40, 100)), 8000)),
        Row(2L, Array[Byte](1, 2, 3, 4))),
      schema)
    assert(AudioDedup.audioHashes(df, "payload", "id").count() == 1)
  }

  test("frame-boundary arithmetic: energies partition the samples exactly") {
    // hash of a constant-amplitude wave (all energies equal) is 0 —
    // every strict > comparison fails
    val flat = Array.fill[Short](320)(1000)
    assert(AudioDedup.energyHash(flat) == 0L)
  }
}

package graft.multimodal

import graft.SparkSpec

/** The windowed-sinc tier's two defining properties vs the
  * nearest-neighbor tier it sits beside (round-10 directive #8):
  * alias SUPPRESSION of energy above the destination Nyquist (which
  * nearest folds back into band essentially undiminished) and unity
  * passband gain. Plus the frame-count and integer contracts the
  * oracle relies on.
  */
class MultimodalResampleSpec extends SparkSpec {

  private val srcRate = 8000
  private val dstRate = 5000 // L/M = 5/8, dst Nyquist 2500 Hz

  private def tone(freqHz: Double, n: Int, amp: Double = 12000.0): Array[Short] =
    Array.tabulate[Short](n)(i =>
      math.round(amp * math.sin(2 * math.Pi * freqHz * i / srcRate)).toShort)

  private def energy(c: Array[Short]): Double = {
    var s = 0.0
    var i = 0
    while (i < c.length) { s += c(i).toDouble * c(i); i += 1 }
    s / math.max(1, c.length)
  }

  test("out-of-band tone: sinc suppresses what nearest aliases") {
    val x = Array(tone(3600.0, 4000)) // 1100 Hz above the dst Nyquist
    val inE = energy(x(0))
    val near = Multimodal.resampleNearest(x, srcRate, dstRate)
    val sinc = Multimodal.resampleSinc(x, srcRate, dstRate)
    val nearE = energy(near(0))
    val sincE = energy(sinc(0))
    // Nearest keeps the aliased energy in band (same order as input)…
    assert(nearE > 0.2 * inE, s"nearest aliased energy $nearE vs input $inE")
    // …sinc kills ≥ 99% of it and beats nearest by ≥ 20 dB.
    assert(sincE < 0.01 * inE, s"sinc residual $sincE vs input $inE")
    assert(sincE < 0.01 * nearE, s"sinc $sincE vs nearest $nearE")
  }

  test("in-band passband: unity gain within quantization slack") {
    val x = Array(tone(440.0, 4000)) // well inside both Nyquists
    val sinc = Multimodal.resampleSinc(x, srcRate, dstRate)
    val ratio = energy(sinc(0).drop(100).dropRight(100)) /
      energy(x(0).drop(160).dropRight(160))
    assert(math.abs(ratio - 1.0) < 0.02, s"passband energy ratio $ratio")
    // DC exactly: a constant signal resamples to the same constant.
    val dc = Array(Array.fill[Short](2000)(1000))
    val dcOut = Multimodal.resampleSinc(dc, srcRate, dstRate)
    val interior = dcOut(0).drop(100).dropRight(100)
    assert(interior.forall(v => math.abs(v - 1000) <= 1),
      s"DC drifted: ${interior.distinct.toSeq.take(5)}")
  }

  test("frame-count contract matches the nearest tier; determinism") {
    for (n <- Seq(0, 1, 99, 100, 4001)) {
      val x = Array(tone(500.0, n))
      val a = Multimodal.resampleSinc(x, srcRate, dstRate)
      val b = Multimodal.resampleNearest(x, srcRate, dstRate)
      assert(a(0).length == b(0).length, s"n=$n")
      assert(a(0).toSeq == Multimodal.resampleSinc(x, srcRate, dstRate)(0).toSeq)
    }
    // Identity ratio: taps collapse to a unit impulse branch — but via
    // convolution; verify the signal survives bit-exactly.
    val x = Array(tone(700.0, 1000))
    assert(Multimodal.resampleSinc(x, 8000, 8000)(0).toSeq == x(0).toSeq)
  }

  test("upsampling branch (L>M): frame count, energy preservation, DC exactness") {
    val x = Array(tone(440.0, 4000))
    val up = Multimodal.resampleSinc(x, 8000, 12000) // L/M = 3/2
    assert(up(0).length == 4000 * 3 / 2)
    val ratio = energy(up(0).drop(150).dropRight(150)) /
      energy(x(0).drop(100).dropRight(100))
    assert(math.abs(ratio - 1.0) < 0.02, s"upsample energy ratio $ratio")
    val dc = Array(Array.fill[Short](2000)(1000))
    val interior = Multimodal.resampleSinc(dc, 8000, 12000)(0)
      .drop(100).dropRight(100)
    assert(interior.forall(v => math.abs(v - 1000) <= 1),
      s"DC drifted on upsample: ${interior.distinct.toSeq.take(5)}")
  }

  test("tap table: odd length, symmetric, Q15 DC gain ≈ L/M branch sum") {
    val taps = Multimodal.sincTaps(5, 8)
    assert(taps.length % 2 == 1)
    val h = (taps.length - 1) / 2
    assert((0 to h).forall(k => taps(h + k) == taps(h - k)), "asymmetric taps")
    // Each polyphase branch (the taps one output sample actually uses)
    // must sum to ~2^15 — that IS the unity-gain condition.
    val branchSums = (0 until 5).map { phase =>
      (-h to h).filter(k => ((phase * 8 - k) % 5 + 5) % 5 == 0)
        .map(k => taps(h + k)).sum
    }
    branchSums.foreach(s =>
      assert(math.abs(s - 32768) < 400, s"branch gain $s vs 32768"))
  }
}

package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Gates for the audio energy signature (q60g): hand-computed vectors,
  * the gain-invariance property the mean-relative bits buy, and edge
  * shapes (empty, header-only, odd trailing byte).
  */
class AudioEnergySpec extends AnyFunSuite {

  private def pcm(samples: Seq[Int]): Array[Byte] =
    samples.flatMap { s =>
      val u = if (s < 0) s + 65536 else s
      Seq((u & 0xFF).toByte, ((u >> 8) & 0xFF).toByte)
    }.toArray

  test("known vector: loud samples set their bits, quiet ones don't") {
    // |s| = 10, 10, 1000, 10 → sum 1030, take 4; bit set iff |s|*4 > 1030
    val sig = AudioEnergy.signature(pcm(Seq(10, -10, 1000, 10)), 0, 63)
    assert(sig(0) == 4L) // n_words
    assert(sig(1) == 1030L / 4) // mean_abs
    assert(sig(2) == (1L << 2)) // only the loud sample crosses the mean
  }

  test("gain invariance: scaling every sample leaves the fingerprint fixed") {
    val base = Seq(12, -40, 7, 300, -5, 90, 2, -310)
    val s1 = AudioEnergy.signature(pcm(base), 0, 63)
    val s2 = AudioEnergy.signature(pcm(base.map(_ * 3)), 0, 63)
    assert(s1(2) == s2(2), "fingerprint must not depend on gain")
    // the mean scales with the gain (up to floor); the signature doesn't
    assert(s2(1) == base.map(x => math.abs(x) * 3L).sum / base.length)
  }

  test("negative extreme decodes as two's complement") {
    val sig = AudioEnergy.signature(pcm(Seq(-32768, 1)), 0, 63)
    assert(sig(1) == (32768L + 1) / 2)
    assert(sig(2) == 1L) // |−32768| dominates the mean
  }

  test("header skip, odd trailing byte, and empty payloads") {
    val payload = Array.fill[Byte](44)(0x7F.toByte) ++ pcm(Seq(5, 500)) :+ 0x01.toByte
    val sig = AudioEnergy.signature(payload, 44, 63)
    assert(sig(0) == 2L) // trailing odd byte ignored
    assert(sig(2) == (1L << 1))
    assert(AudioEnergy.signature(Array.emptyByteArray, 44, 63).toSeq ==
      Seq(0L, 0L, 0L))
    assert(AudioEnergy.signature(Array.fill[Byte](44)(1), 44, 63).toSeq ==
      Seq(0L, 0L, 0L))
  }

  test("take cap: only the first maxWords samples shape the signature") {
    val many = Seq.fill(100)(10) :+ 30000
    val sig = AudioEnergy.signature(pcm(many), 0, 63)
    assert(sig(0) == 101L)
    assert(sig(2) == 0L) // the loud sample sits past the 63-word window
  }
}

package graft

import graft.ext.Multimodal._

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the container-header probes: synthesize→parse
  * round-trips over the full field domains (not just the driver query's
  * formula subset), and parser totality on arbitrary byte junk. */
class ProbePropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1234L + i)))

  test("image probes round-trip across the full dimension domain") {
    val dims = Gen.zip(Gen.chooseNum(1, 65535), Gen.chooseNum(1, 65535))
    for ((w, h) <- samples(dims, 200)) {
      assert(probeImageHeader(synthesizeImage("png", w, h)) == Some(("png", w, h)))
      assert(probeImageHeader(synthesizeImage("jpeg", w, h)) == Some(("jpeg", w, h)))
      assert(probeImageHeader(synthesizeImage("gif", w, h)) == Some(("gif", w, h)))
    }
    // PNG dimensions are 31-bit; above the 16-bit formats' range
    for ((w, h) <- samples(Gen.zip(Gen.chooseNum(65536, Int.MaxValue),
        Gen.chooseNum(65536, Int.MaxValue)), 50))
      assert(probeImageHeader(synthesizeImage("png", w, h)) == Some(("png", w, h)))
  }

  test("wav probe round-trips across channels/rates/depths") {
    val g = for {
      ch <- Gen.chooseNum(1, 8)
      rate <- Gen.chooseNum(8000, 192000)
      bits <- Gen.oneOf(8, 16, 24, 32)
      data <- Gen.chooseNum(0, Int.MaxValue / 2)
    } yield (ch, rate, bits, data)
    for ((ch, rate, bits, data) <- samples(g, 200))
      assert(probeWavHeader(synthesizeWav(ch, rate, bits, data)) ==
        Some((ch, rate, bits, data)))
  }

  test("mp4 probe round-trips across timescale/duration") {
    val g = Gen.zip(Gen.chooseNum(1, Int.MaxValue), Gen.chooseNum(0, Int.MaxValue))
    for ((ts, dur) <- samples(g, 200))
      assert(probeMp4Header(synthesizeMp4("isom", ts, dur)) ==
        Some(("isom", ts.toLong, dur.toLong)))
  }

  test("probes are total on arbitrary junk bytes (None, never throw)") {
    val junk = Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    for (b <- samples(junk, 300)) {
      probeImageHeader(b)
      probeWavHeader(b)
      probeMp4Header(b)
    }
    // adversarial prefixes: valid signatures with truncated/garbage tails
    for (n <- 0 to 40) {
      probeImageHeader(synthesizeImage("jpeg", 100, 100).take(n))
      probeWavHeader(synthesizeWav(2, 44100, 16, 10).take(n))
      probeMp4Header(synthesizeMp4("isom", 600, 600).take(n))
    }
  }
}

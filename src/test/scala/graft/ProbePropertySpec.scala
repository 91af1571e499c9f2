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

  // --- crafted-size adversarial cases: valid magic, hostile size fields.
  // Junk-byte fuzzing can't reach these walks (they need valid container
  // signatures); each case below previously wrapped an Int offset
  // negative and threw instead of honoring the None-never-throw contract.

  private def be32(v: Long) = Array[Byte](
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
  private def le32(v: Long) = Array[Byte](
    v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private val ftyp = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0)

  test("wav probe returns None on chunk sizes that overflow Int offsets") {
    def riff(chunks: Array[Byte]) =
      "RIFF".getBytes ++ le32(4 + chunks.length) ++ "WAVE".getBytes ++ chunks
    // 8 + size + (size & 1) wraps Int when size is near Int.MaxValue
    for (size <- Seq(0x7ffffff9L, 0x7ffffffeL, 0x80000000L, 0xfffffff0L)) {
      val b = riff("JUNK".getBytes ++ le32(size) ++ Array.fill(64)(0x41.toByte))
      assert(probeWavHeader(b) == None)
    }
    // a data chunk claiming > Int.MaxValue bytes cannot fit the Int
    // contract: unparseable, not a negative payload size
    val big = riff("data".getBytes ++ le32(0x90000000L))
    assert(probeWavHeader(big) == None)
  }

  test("mp4 probe returns None on box sizes that overflow Int offsets") {
    // top-level box with size >= 2^31: must walk past the end, not wrap
    for (size <- Seq(0x80000000L, 0xfffffff8L)) {
      val b = ftyp ++ be32(size) ++ "free".getBytes ++ Array.fill(64)(0.toByte)
      assert(probeMp4Header(b) == None)
    }
    // moov child with a hostile 32-bit size
    val moovKids = be32(0x80000000L) ++ "trak".getBytes ++ Array.fill(32)(0.toByte)
    val moov = be32(8L + moovKids.length) ++ "moov".getBytes ++ moovKids
    assert(probeMp4Header(ftyp ++ moov) == None)
    // size==1 with a hostile 64-bit largesize
    val huge = be32(1) ++ "free".getBytes ++ be64(0x7fffffffffffffffL)
    assert(probeMp4Header(ftyp ++ huge ++ Array.fill(32)(0.toByte)) == None)
  }

  test("mp4 probe handles spec size==0 (to-end) and size==1 (largesize) boxes") {
    val mvhdPayload = be32(0) /* verflags v0 */ ++ be32(0) ++ be32(0) ++
      be32(600) /* timescale */ ++ be32(1234) /* duration */ ++
      Array.fill(80)(0.toByte)
    val mvhd = be32(8L + mvhdPayload.length) ++ "mvhd".getBytes ++ mvhdPayload
    // moov with size==0: extends to end of file
    assert(probeMp4Header(ftyp ++ be32(0) ++ "moov".getBytes ++ mvhd) ==
      Some(("isom", 600L, 1234L)))
    // moov with size==1: 64-bit largesize
    val large = be32(1) ++ "moov".getBytes ++ be64(16L + mvhd.length) ++ mvhd
    assert(probeMp4Header(ftyp ++ large) == Some(("isom", 600L, 1234L)))
  }
}

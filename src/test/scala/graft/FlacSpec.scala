package graft

import graft.sources.Flac
import org.scalatest.funsuite.AnyFunSuite

/** The FLAC bitstream written from RFC 9639 — the reference's
  * lossless container-matrix leg (test_containers.py:29,
  * `test_flac_audio_container`). Pins the published CRC check values,
  * the extended-UTF-8 coded number against Java's own UTF-8 encoder,
  * frame/subframe structure, bit-exact lossless round trips across
  * block-size escape paths and value extremes, STREAMINFO's raw-MD5,
  * and a foreign-file decode path (LPC subframe, stereo
  * decorrelation, rice2 + escaped partitions) the encoder itself
  * never emits. */
class FlacSpec extends AnyFunSuite {

  private def pcm(n: Int, seed: Long = 1): Array[Int] =
    Array.tabulate(n)(i => (((i + seed) * 2654435761L) % 65536L - 32768L).toInt)

  test("CRC-8 (poly 0x07) and CRC-16 (poly 0x8005) match published check values") {
    val m = "123456789".getBytes("US-ASCII")
    assert(Flac.crc8(m, 0, m.length) == 0xf4)   // CRC-8/SMBUS check value
    assert(Flac.crc16(m, 0, m.length) == 0xfee8) // CRC-16/UMTS check value
  }

  test("coded number agrees with Java UTF-8 where Unicode overlaps, and round-trips beyond") {
    // below the surrogate range the FLAC coded number IS UTF-8
    Seq(0, 1, 0x7f, 0x80, 0x7ff, 0x800, 0xd7ff).foreach { cp =>
      val w = new Flac.BitWriter
      Flac.writeCodedNumber(w, cp.toLong)
      val expect = new String(Character.toChars(cp)).getBytes("UTF-8")
      assert(w.toBytes.toSeq == expect.toSeq, s"cp=$cp")
    }
    // boundary widths round-trip up to the 36-bit maximum
    Seq(0L, 127L, 128L, 2047L, 2048L, 65535L, 65536L, (1L << 21) - 1,
      1L << 21, (1L << 26) - 1, 1L << 26, (1L << 31) - 1, 1L << 31,
      (1L << 36) - 1).foreach { v =>
      val w = new Flac.BitWriter
      Flac.writeCodedNumber(w, v)
      val b = w.toBytes
      assert(b.length == Flac.codedNumberLength(v))
      val r = new Flac.BitReader(b)
      assert(Flac.readCodedNumber(r) == v, s"v=$v")
    }
  }

  test("fixed predictors invert for every order") {
    val x = pcm(64)
    (0 to 4).foreach { o =>
      val res = Flac.fixedResiduals(x, o)
      val warm = x.take(o).map(_.toLong)
      val back = Flac.fixedReconstruct(warm, res, o)
      assert(back.toSeq == x.map(_.toLong).toSeq, s"order=$o")
    }
  }

  test("mono round trip is bit-exact and STREAMINFO carries the raw MD5") {
    val x = pcm(1000)
    val bytes = Flac.encodeFile(Array(x), 16000, blockSize = 256)
    assert(new String(bytes.take(4), "US-ASCII") == "fLaC")
    val (si, got) = Flac.decodeFile(bytes)
    assert(got.length == 1 && got(0).toSeq == x.toSeq)
    assert(si.sampleRate == 16000 && si.channels == 1 && si.bitsPerSample == 16)
    assert(si.totalSamples == 1000)
    assert(si.minBlockSize == 256 && si.maxBlockSize == 256)
    assert(si.md5.toSeq == Flac.rawMd5(Array(x)).toSeq)
    assert(si.minFrameSize > 0 && si.maxFrameSize >= si.minFrameSize)
  }

  test("STREAMINFO total_samples = 0 means UNKNOWN (RFC 9639): frames " +
      "decode until end-of-bytes instead of an empty stream") {
    val x = pcm(700)
    val bytes = Flac.encodeFile(Array(x), 16000, blockSize = 256)
    // total_samples is the 36-bit field at STREAMINFO bit offset 108:
    // low nibble of byte 13 + bytes 14..17 of the block body, which
    // starts at file offset 8 (fLaC + block header)
    val streaming = bytes.clone()
    streaming(8 + 13) = (streaming(8 + 13) & 0xf0).toByte
    (14 to 17).foreach(i => streaming(8 + i) = 0)
    val (si, got) = Flac.decodeFile(streaming)
    assert(si.totalSamples == 0L)
    assert(got.length == 1 && got(0).toSeq == x.toSeq,
      "unknown-total file must decode every frame, not zero samples")
  }

  test("tail-block escape paths: lengths exercising every block-size code branch") {
    // 256→code 1000; 192-tail→code 0001; odd tails→8-bit escape;
    // a 300-block at blockSize 300 → 16-bit escape path
    Seq(1, 2, 3, 191, 192, 193, 255, 256, 257, 511, 512, 448).foreach { n =>
      val x = pcm(n, seed = n)
      val bytes = Flac.encodeFile(Array(x), 44100, blockSize = 256)
      val (si, got) = Flac.decodeFile(bytes)
      assert(got(0).toSeq == x.toSeq, s"n=$n")
      assert(si.totalSamples == n.toLong)
    }
    val y = pcm(300)
    val (_, got) = Flac.decodeFile(Flac.encodeFile(Array(y), 12345, blockSize = 300))
    assert(got(0).toSeq == y.toSeq) // non-tabled rate → STREAMINFO code path too
  }

  test("constant blocks use the CONSTANT subframe (file shrinks) and extremes survive") {
    val const = Array.fill(1024)(-12345)
    val noisy = pcm(1024)
    val cBytes = Flac.encodeFile(Array(const), 16000, blockSize = 256)
    val nBytes = Flac.encodeFile(Array(noisy), 16000, blockSize = 256)
    assert(cBytes.length < nBytes.length / 4, "constant signal must compress hard")
    assert(Flac.decodeFile(cBytes)._2(0).toSeq == const.toSeq)
    val extreme = Array.tabulate(500)(i => if (i % 2 == 0) 32767 else -32768)
    val eBytes = Flac.encodeFile(Array(extreme), 16000, blockSize = 256)
    assert(Flac.decodeFile(eBytes)._2(0).toSeq == extreme.toSeq)
  }

  test("a smooth ramp picks a higher fixed order and compresses below verbatim size") {
    val ramp = Array.tabulate(4096)(i => (i / 4) - 512) // order-1/2 friendly
    val bytes = Flac.encodeFile(Array(ramp), 48000, blockSize = 256)
    assert(bytes.length < 4096 * 2 / 2, "ramp must compress at least 2:1")
    assert(Flac.decodeFile(bytes)._2(0).toSeq == ramp.toSeq)
  }

  test("stereo independent channels round trip") {
    val l = pcm(777, seed = 3)
    val r = pcm(777, seed = 9)
    val bytes = Flac.encodeFile(Array(l, r), 32000, blockSize = 192)
    val (si, got) = Flac.decodeFile(bytes)
    assert(si.channels == 2)
    assert(got(0).toSeq == l.toSeq && got(1).toSeq == r.toSeq)
  }

  test("frame CRC-16 corruption is detected") {
    val bytes = Flac.encodeFile(Array(pcm(300)), 16000, blockSize = 256)
    val bad = bytes.clone()
    bad(bytes.length - 1) = (bad(bytes.length - 1) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException](Flac.decodeFile(bad))
    assert(e.getMessage.contains("CRC"))
  }

  test("header CRC-8 corruption is detected") {
    val bytes = Flac.encodeFile(Array(pcm(300)), 16000, blockSize = 256)
    val bad = bytes.clone()
    // byte 42+4 sits inside the first frame header (after sync bytes)
    bad(46) = (bad(46) ^ 0x10).toByte
    intercept[IllegalArgumentException](Flac.decodeFile(bad))
  }

  test("unknown metadata blocks are skipped (padding + vorbis-comment shaped)") {
    val x = pcm(128)
    val bytes = Flac.encodeFile(Array(x), 16000, blockSize = 256)
    // rebuild: fLaC + STREAMINFO(not last) + PADDING(last) + frames
    val out = new java.io.ByteArrayOutputStream()
    out.write(bytes, 0, 4)
    out.write(0x00) // STREAMINFO, not last
    out.write(bytes, 5, 3 + 34)
    out.write(0x81); out.write(0); out.write(0); out.write(16) // PADDING, last
    out.write(new Array[Byte](16))
    out.write(bytes, 42, bytes.length - 42)
    val (si, got) = Flac.decodeFile(out.toByteArray)
    assert(got(0).toSeq == x.toSeq && si.totalSamples == 128)
  }

  test("foreign file: left/side stereo with an LPC subframe, rice2 and an escaped partition") {
    // Hand-mux one frame the encoder never emits, prove the decoder's
    // width: blockSize 16, left = LPC order-1 (coef 1, shift 0 — a
    // pure integrator), side = verbatim, rice2 method with partition
    // order 1 where the second partition escapes to 6-bit literals.
    val left = Array.tabulate(16)(i => 100 + 3 * i)
    val right = Array.tabulate(16)(i => 90 + 3 * i)
    val side = Array.tabulate(16)(i => left(i) - right(i)) // constant 10
    val w = new Flac.BitWriter
    w.writeBits(0x3ffe, 14); w.writeBits(0, 1); w.writeBits(0, 1)
    w.writeBits(6, 4)  // 8-bit block size escape
    w.writeBits(5, 4)  // 16 kHz
    w.writeBits(8, 4)  // left/side
    w.writeBits(4, 3)  // 16-bit
    w.writeBits(0, 1)
    Flac.writeCodedNumber(w, 0L)
    w.writeBits(15, 8) // blockSize-1
    val header = w.toBytes
    val w3 = new Flac.BitWriter
    header.foreach(b => w3.writeBits(b & 0xffL, 8))
    w3.writeBits(Flac.crc8(header, 0, header.length).toLong, 8)
    // left: LPC order 1, precision 2, shift 0, coef +1 → x[i] = res + x[i-1]
    w3.writeBits(0, 1); w3.writeBits(0x20, 6); w3.writeBits(0, 1)
    w3.writeSigned(left(0).toLong, 16)
    w3.writeBits(1, 4)      // precision - 1 = 1
    w3.writeSigned(0L, 5)   // shift 0
    w3.writeSigned(1L, 2)   // qlp coef = +1
    // residuals: rice2 (method 01), partition order 1 → two partitions
    // first partition: 16/2 - 1 = 7 residuals, rice2 param 3
    // second partition: 8 residuals, ESCAPE (param 31) with 6-bit raw
    val res = Array.tabulate(15)(i => (left(i + 1) - left(i)).toLong) // all 3
    w3.writeBits(1, 2); w3.writeBits(1, 4)
    w3.writeBits(3, 5)
    res.take(7).foreach { r =>
      val z = Flac.zigzag(r); w3.writeUnary(z >>> 3); w3.writeBits(z, 3)
    }
    w3.writeBits(31, 5) // rice2 escape
    w3.writeBits(6, 5)  // 6-bit literals
    res.drop(7).foreach(r => w3.writeSigned(r, 6))
    // side: (17-bit!) verbatim subframe — the decorrelated side channel
    w3.writeBits(0, 1); w3.writeBits(1, 6); w3.writeBits(0, 1)
    side.foreach(v => w3.writeSigned(v.toLong, 17))
    val body = w3.toBytes
    val frame = new java.io.ByteArrayOutputStream()
    frame.write(body)
    val c16 = Flac.crc16(body, 0, body.length)
    frame.write((c16 >> 8) & 0xff); frame.write(c16 & 0xff)
    // file: marker + STREAMINFO(last) + frame
    val si = new Flac.BitWriter
    si.writeBits(16, 16); si.writeBits(16, 16)
    si.writeBits(0, 24); si.writeBits(0, 24)
    si.writeBits(16000, 20); si.writeBits(1, 3); si.writeBits(15, 5)
    si.writeBits(16, 36)
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(si.toBytes)
    out.write(Flac.rawMd5(Array(left, right))) // correct digest for the pair
    out.write(frame.toByteArray)
    val (gotSi, got) = Flac.decodeFile(out.toByteArray)
    assert(gotSi.channels == 2)
    assert(got(0).toSeq == left.toSeq)
    assert(got(1).toSeq == right.toSeq)
  }

  test("encoder choice rules are the documented deterministic pair") {
    // order: min Σ|res|, ties to lower order; k: min exact bits, ties smaller k
    val x = pcm(256)
    val (o, k) = Flac.chooseFixed(x)
    val costs = (0 to 2).map(oo => Flac.fixedResiduals(x, oo).map(math.abs).sum)
    assert(costs(o) == costs.min && costs.take(o).forall(_ > costs(o)))
    val zs = Flac.fixedResiduals(x, o).map(Flac.zigzag)
    val bits = (0 to 14).map(kk => Flac.riceCost(zs, kk))
    assert(bits(k) == bits.min && bits.take(k).forall(_ > bits(k)))
  }
}

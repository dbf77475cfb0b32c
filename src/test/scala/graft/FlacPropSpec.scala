package graft

import graft.sources.Flac
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the FLAC bitstream: the losslessness contract
  * (decode ∘ encode = id for EVERY signal, not the fixtures FlacSpec
  * picks), the STREAMINFO MD5 invariant, the coded-number bijection
  * over its full 36-bit domain, the Rice-cost optimality the p13
  * oracle re-derives, and a full single-bit-corruption sweep proving
  * no flip is ever SILENT. Complements FlacSpec's golden vectors the
  * way SketchPropSpec complements SketchSpec (same deterministic
  * seeded-Gen harness). */
class FlacPropSpec extends AnyFunSuite {

  private def check[A](gen: Gen[A], trials: Int)(p: A => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
    (0 until trials).foreach { _ =>
      p(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  private val sampleGen: Gen[Int] = Gen.frequency(
    (4, Gen.choose(-32768, 32767)),
    (2, Gen.choose(-64, 64)),            // small-residual regime
    (1, Gen.oneOf(-32768, 32767, 0)),    // extremes
    (1, Gen.const(1234)))                // constant-run contributor

  private val signalGen: Gen[(List[Int], Int)] = for {
    n <- Gen.choose(1, 700)
    bs <- Gen.oneOf(16, 64, 192, 256, 300)
    xs <- Gen.listOfN(n, sampleGen)
  } yield (xs, bs)

  test("decode ∘ encode = id and STREAMINFO invariants, any signal/block size") {
    check(signalGen, 40) { case (l, bs) =>
      val xs = l.toArray
      val bytes = Flac.encodeFile(Array(xs), 16000, blockSize = bs)
      val (si, got) = Flac.decodeFile(bytes)
      assert(got.length == 1 && got(0).sameElements(xs))
      assert(si.totalSamples == xs.length.toLong)
      assert(si.md5.sameElements(Flac.rawMd5(Array(xs))))
      assert(si.minFrameSize > 0 && si.maxFrameSize >= si.minFrameSize)
      assert(bytes.length >= 42 + si.minFrameSize)
    }
  }

  test("stereo decode ∘ encode = id") {
    val stereoGen = for {
      n <- Gen.choose(1, 300)
      l <- Gen.listOfN(n, sampleGen)
      r <- Gen.listOfN(n, sampleGen)
    } yield (l, r)
    check(stereoGen, 25) { case (l, r) =>
      val (la, ra) = (l.toArray, r.toArray)
      val (_, got) = Flac.decodeFile(
        Flac.encodeFile(Array(la, ra), 48000, blockSize = 64))
      assert(got.length == 2)
      assert(got(0).sameElements(la) && got(1).sameElements(ra))
    }
  }

  test("coded number is a bijection over [0, 2^36)") {
    check(Gen.choose(0L, (1L << 36) - 1), 300) { v =>
      val w = new Flac.BitWriter
      Flac.writeCodedNumber(w, v)
      val b = w.toBytes
      assert(b.length == Flac.codedNumberLength(v))
      assert(Flac.readCodedNumber(new Flac.BitReader(b)) == v, s"v=$v")
    }
  }

  test("fixed predictors invert on arbitrary signals, all orders") {
    val g = for {
      o <- Gen.choose(0, 4)
      n <- Gen.choose(o + 1, 200)
      xs <- Gen.listOfN(n, sampleGen)
    } yield (xs, o)
    check(g, 50) { case (l, o) =>
      val xs = l.toArray
      assert(Flac.fixedReconstruct(xs.take(o).map(_.toLong),
        Flac.fixedResiduals(xs, o), o).sameElements(xs.map(_.toLong)))
    }
  }

  test("chooseFixed's k is the exact Rice-cost argmin with ties to the smaller k") {
    check(Gen.nonEmptyListOf(sampleGen), 60) { l =>
      val xs = l.toArray
      if (!xs.forall(_ == xs(0))) { // CONSTANT path has no rice choice
        val (o, k) = Flac.chooseFixed(xs)
        val zs = Flac.fixedResiduals(xs, o).map(Flac.zigzag)
        val bits = (0 to 14).map(kk => Flac.riceCost(zs, kk))
        assert(bits(k) == bits.min && bits.take(k).forall(_ > bits(k)))
      }
    }
  }

  test("every single-bit corruption of a small file is rejected or leaves samples intact") {
    // CRC-8 covers the frame header, CRC-16 the whole frame including
    // padding, the marker/metadata requires the rest; STREAMINFO
    // stat-field flips (min/max frame size, md5) decode with samples
    // unchanged. Assert: no flip ever yields DIFFERENT samples.
    val xs = Array.tabulate(60)(i => (i * 997) % 3000 - 1500)
    val bytes = Flac.encodeFile(Array(xs), 16000, blockSize = 64)
    var silent = 0
    (0 until bytes.length * 8).foreach { bit =>
      val bad = bytes.clone()
      bad(bit / 8) = (bad(bit / 8) ^ (1 << (bit % 8))).toByte
      try {
        val (_, got) = Flac.decodeFile(bad)
        if (got.length != 1 || !got(0).sameElements(xs)) silent += 1
      } catch { case _: Exception => () }
    }
    assert(silent == 0, s"$silent single-bit flips silently changed samples")
  }
}

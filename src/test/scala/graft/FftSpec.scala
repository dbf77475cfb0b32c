package graft

import graft.functions.Fft
import org.scalatest.funsuite.AnyFunSuite

/** FFT kernel verified against a naive O(n²) DFT. */
class FftSpec extends AnyFunSuite {

  private def naiveDftMags(x: Array[Double]): Array[Double] = {
    val n = x.length
    Array.tabulate(n / 2) { k =>
      var re = 0.0; var im = 0.0
      for (t <- 0 until n) {
        val ang = -2.0 * math.Pi * k * t / n
        re += x(t) * math.cos(ang)
        im += x(t) * math.sin(ang)
      }
      math.hypot(re, im)
    }
  }

  private def sig(n: Int): Array[Double] =
    Array.tabulate(n)(i => math.sin(2 * math.Pi * 5 * i / n) +
      0.5 * math.cos(2 * math.Pi * 13 * i / n) + 0.1 * (i % 7))

  test("fft magnitudes match naive DFT") {
    for (n <- Seq(8, 64, 256)) {
      val x = sig(n)
      val got = Fft.magnitudes(x)
      val want = naiveDftMags(x)
      got.zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-8 * math.max(1.0, w), s"n=$n")
      }
    }
  }

  test("pure tone concentrates in its bin") {
    val n = 256
    val x = Array.tabulate(n)(i => math.sin(2 * math.Pi * 32 * i / n))
    val mags = Fft.magnitudes(x)
    assert(mags(32) > 100)
    assert(mags.zipWithIndex.filter(_._2 != 32).map(_._1).max < 1e-9 * mags(32))
  }

  test("binned magnitudes sum the bands") {
    val x = sig(256)
    val mags = Fft.magnitudes(x)
    val binned = Fft.binnedMagnitudes(x, 8)
    for (b <- 0 until 8)
      assert(math.abs(binned(b) - mags.slice(b * 16, (b + 1) * 16).sum) < 1e-9)
  }

  test("rejects non-power-of-two") {
    intercept[IllegalArgumentException](Fft.magnitudes(new Array[Double](100)))
  }
}

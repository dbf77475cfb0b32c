package graft.functions

/** Iterative radix-2 FFT kernel (JVM-side array function).
  *
  * The analytic analogue of the reference's audio frequency display,
  * which runs np.fft over sample windows and bins the magnitudes
  * (/root/reference/streamtasks/system/tasks/ui/audiofrequencydisplay.py:46-48).
  * Used from a Spark UDF over collected sample windows — an array-level
  * kernel like the reference's numpy call, not a per-row UDF.
  */
object Fft {

  /** In-place iterative Cooley-Tukey; n must be a power of two. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, s"fft size must be a power of 2, got $n")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var k = 0
      while (k < n) {
        var cr = 1.0
        var ci = 0.0
        var m = 0
        while (m < len / 2) {
          val ur = re(k + m); val ui = im(k + m)
          val vr = re(k + m + len / 2) * cr - im(k + m + len / 2) * ci
          val vi = re(k + m + len / 2) * ci + im(k + m + len / 2) * cr
          re(k + m) = ur + vr; im(k + m) = ui + vi
          re(k + m + len / 2) = ur - vr; im(k + m + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          m += 1
        }
        k += len
      }
      len <<= 1
    }
  }

  /** Magnitude spectrum of a real signal (first n/2 bins). */
  def magnitudes(signal: Array[Double]): Array[Double] = {
    val re = signal.clone()
    val im = new Array[Double](signal.length)
    fft(re, im)
    Array.tabulate(signal.length / 2)(k => math.hypot(re(k), im(k)))
  }

  /** Magnitudes summed into `bins` equal-width frequency bins, like
    * the reference display's binned sums. */
  def binnedMagnitudes(signal: Array[Double], bins: Int): Array[Double] = {
    val mags = magnitudes(signal)
    val per = mags.length / bins
    Array.tabulate(bins) { b =>
      var s = 0.0
      var k = b * per
      while (k < (b + 1) * per) { s += mags(k); k += 1 }
      s
    }
  }
}

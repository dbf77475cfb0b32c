package graft.functions

/** JVM image kernels for the video operators (SURVEY §2.2 #23-24) —
  * frames are opaque byte arrays in rows (the multimodal binary-column
  * pattern), processed by typed map/mapPartitions, never exploded to
  * per-pixel rows.
  *
  * Blend semantics reproduce the reference's C++ kernel
  * (/root/reference/streamtasks/media/video_perf_all.cpp:9-60): 4-byte
  * alpha pixels, layers composited in order with integer arithmetic
  * out = (255−α)·out + α·src, /255, output alpha forced to 255. Layout
  * semantics follow videolayout.py:79-91 (nearest-neighbor stand-in
  * for cv2's bilinear resize — the placement/canvas logic is the
  * operator; interpolation quality is a kernel detail).
  *
  * Scale: one frame = one row; a 100 TB frame corpus maps to
  * mapPartitions over binary columns with per-partition kernel reuse —
  * the same mount as [[graft.operators.MultimodalQueries]] m03.
  */
object ImageKernel {

  /** Alpha-composite `layers` (RGBA or ARGB byte frames) into one
    * frame; truncates to the shortest layer like the reference. */
  def mergeImages(layers: Seq[Array[Byte]], alphaFront: Boolean): Array[Byte] = {
    require(layers.nonEmpty, "mergeImages needs at least one layer")
    val size = layers.map(_.length).min - (layers.map(_.length).min % 4)
    val out = new Array[Byte](size)
    var off = 0
    while (off < size) {
      val (alphaIdx, cvIdx) = if (alphaFront) (off, off + 1) else (off + 3, off)
      out(alphaIdx) = 255.toByte
      var i = 0
      while (i < layers.length) {
        val frame = layers(i)
        val alpha = frame(if (alphaFront) off else off + 3) & 0xff
        val alphaOld = 255 - alpha
        var c = 0
        while (c < 3) {
          val cur = out(cvIdx + c) & 0xff
          val src = frame(cvIdx + c) & 0xff
          out(cvIdx + c) = ((alphaOld * cur + alpha * src) / 255).toByte
          c += 1
        }
        i += 1
      }
      off += 4
    }
    out
  }

  /** Video layout: resize an RGBA frame (nearest neighbor) to
    * (placeW, placeH) and paste it at (top, left) on a transparent
    * (outW, outH) canvas. */
  def layout(frame: Array[Byte], inW: Int, inH: Int,
      placeW: Int, placeH: Int, top: Int, left: Int,
      outW: Int, outH: Int): Array[Byte] = {
    require(frame.length >= inW * inH * 4, "frame too small for claimed dims")
    val out = new Array[Byte](outW * outH * 4)
    var y = 0
    while (y < placeH && top + y < outH) {
      val srcY = y * inH / placeH
      var x = 0
      while (x < placeW && left + x < outW) {
        val srcX = x * inW / placeW
        val s = (srcY * inW + srcX) * 4
        val d = ((top + y) * outW + (left + x)) * 4
        out(d) = frame(s); out(d + 1) = frame(s + 1)
        out(d + 2) = frame(s + 2); out(d + 3) = frame(s + 3)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Difference-hash (dHash) of a 9×8 grayscale image: bit (y·8+x) is
    * set iff pixel (x+1,y) is brighter than pixel (x,y) — 63 bits used
    * (the (7,7) comparison is dropped so the signature lives in a
    * signed 64-bit without overflow-semantics differences between
    * engines). dHash is the standard perceptual image fingerprint for
    * training-data dedup: brightness/contrast shifts leave the
    * pairwise comparisons (and so the hash) unchanged; small local
    * edits flip few bits. */
  def dhash(gray: Array[Int]): Long = {
    require(gray.length >= 72, "dhash expects a 9x8 grayscale image")
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val idx = y * 8 + x
        if (idx < 63 && gray(y * 9 + x + 1) > gray(y * 9 + x))
          h |= 1L << idx
        x += 1
      }
      y += 1
    }
    h
  }

  /** Deterministic 9×8 grayscale camera stand-in for m21 (the m12/m13
    * decode-seam pattern: the real decoder is documented at m01/m03;
    * the synthesis gives the dedup mechanism a controlled near-dup
    * population). Documents sharing `base = id div 16` are the same
    * underlying "photo" — pixels are md5-mixed per (base, x, y), so
    * DISTINCT bases are independent noise (~half the dHash bits
    * apart; an earlier smooth-polynomial pattern left cross-base
    * hamming under the verify threshold because dHash cancels
    * per-image constants). The 16 variants per base differ by one
    * brightened pixel in row 0 — a local edit flipping ≤2 dHash bits,
    * so same-base pairs sit within hamming ≤4. */
  def synthGray(id: Long): Array[Int] = {
    val base = id / 16
    val j = (id % 16).toInt
    val mdig = java.security.MessageDigest.getInstance("MD5")
    val g = new Array[Int](72)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 9) {
        val h = mdig.digest(s"g${base}_${x}_$y".getBytes("UTF-8"))
        var v = h(0) & 0xff
        if (y == 0 && x == j % 9) v += 40
        g(y * 9 + x) = v
        x += 1
      }
      y += 1
    }
    g
  }
}

package graft.functions

/** Block motion estimation / compensation — the mechanism that makes
  * a video codec a VIDEO codec (inter-frame prediction), which the
  * delta-GOP (m09) and JPEG (m14) legs don't have. The reference runs
  * h264/vp8 through libav codec contexts
  * (/root/reference/streamtasks/media/codec.py:50-135); this is the
  * core of that family re-expressed as a deterministic integer
  * kernel: full-search block matching (SAD argmin over a ±range
  * window, ties to the smallest (dy, dx) — the canonical raster-scan
  * rule), wrap-around addressing (borders wrap instead of clamp, so
  * every candidate reads a full block and the arithmetic is exactly
  * mirrorable in SQL), residual coding against the RECONSTRUCTED
  * previous frame (the closed prediction loop that prevents drift),
  * and optional residual quantization (the lossy leg).
  *
  * Frames are row-major Int arrays (pixels as unbounded ints so
  * quantized reconstruction needs no clamp branch). All arithmetic is
  * integer-exact and deterministic — the m28 query pins the
  * estimation against a full SQL argmin.
  */
object Motion {

  final case class BlockMv(bx: Int, by: Int, dx: Int, dy: Int, sad: Long)

  @inline private def wrap(v: Int, n: Int): Int = ((v % n) + n) % n

  /** SAD between the block at (bx·B, by·B) of `cur` and the same block
    * of `ref` displaced by (dx, dy), wrap-around addressing. */
  def sad(cur: Array[Int], ref: Array[Int], w: Int, h: Int, b: Int,
      bx: Int, by: Int, dx: Int, dy: Int): Long = {
    var acc = 0L
    var y = 0
    while (y < b) {
      val cy = by * b + y
      val ry = wrap(cy + dy, h)
      var x = 0
      while (x < b) {
        val cx = bx * b + x
        val rx = wrap(cx + dx, w)
        // difference in LONG: the pixel domain is unbounded int, and
        // an Int subtraction could wrap (abs(Int.MinValue) < 0),
        // silently corrupting the argmin
        acc += math.abs(cur(cy * w + cx).toLong - ref(ry * w + rx))
        x += 1
      }
      y += 1
    }
    acc
  }

  /** Full-search motion estimation: per block, the (dx, dy) in
    * [-range, range]² minimizing SAD, ties broken by smallest
    * (dy, dx) — raster scan order. */
  def estimate(cur: Array[Int], ref: Array[Int], w: Int, h: Int,
      b: Int, range: Int): Seq[BlockMv] = {
    require(w % b == 0 && h % b == 0, s"frame $w×$h not divisible by $b")
    for {
      by <- 0 until h / b
      bx <- 0 until w / b
    } yield {
      var best = BlockMv(bx, by, 0, 0, Long.MaxValue)
      var dy = -range
      while (dy <= range) {
        var dx = -range
        while (dx <= range) {
          val s = sad(cur, ref, w, h, b, bx, by, dx, dy)
          if (s < best.sad) best = BlockMv(bx, by, dx, dy, s)
          dx += 1
        }
        dy += 1
      }
      best
    }
  }

  /** Truncate-toward-zero quantization to multiples of `q` — exact
    * and sign-symmetric on both engines. */
  @inline def quant(r: Int, q: Int): Int =
    (if (r < 0) -((-r) / q) else r / q) * q

  /** One encoded P-frame: per-block motion vectors + (quantized)
    * residuals, against the caller's reconstructed reference. */
  final case class PFrame(mvs: Seq[BlockMv], residuals: Array[Int])

  /** Encode `cur` against the RECONSTRUCTED `ref`; returns the frame
    * and its own reconstruction (the next frame's reference — the
    * closed loop). `q` = 1 is lossless. */
  def encodeP(cur: Array[Int], ref: Array[Int], w: Int, h: Int, b: Int,
      range: Int, q: Int): (PFrame, Array[Int]) = {
    val mvs = estimate(cur, ref, w, h, b, range)
    val res = new Array[Int](w * h)
    val recon = new Array[Int](w * h)
    mvs.foreach { mv =>
      var y = 0
      while (y < b) {
        val cy = mv.by * b + y
        val ry = wrap(cy + mv.dy, h)
        var x = 0
        while (x < b) {
          val cx = mv.bx * b + x
          val rx = wrap(cx + mv.dx, w)
          val pred = ref(ry * w + rx)
          val r = quant(cur(cy * w + cx) - pred, q)
          res(cy * w + cx) = r
          recon(cy * w + cx) = pred + r
          x += 1
        }
        y += 1
      }
    }
    (PFrame(mvs, res), recon)
  }

  /** Decode a P-frame against the same reconstructed reference the
    * encoder used — bit-identical to the encoder's own recon. */
  def decodeP(f: PFrame, ref: Array[Int], w: Int, h: Int, b: Int)
      : Array[Int] = {
    val out = new Array[Int](w * h)
    f.mvs.foreach { mv =>
      var y = 0
      while (y < b) {
        val cy = mv.by * b + y
        val ry = wrap(cy + mv.dy, h)
        var x = 0
        while (x < b) {
          val cx = mv.bx * b + x
          val rx = wrap(cx + mv.dx, w)
          out(cy * w + cx) = ref(ry * w + rx) + res(f, cy * w + cx)
          x += 1
        }
        y += 1
      }
    }
    out
  }

  @inline private def res(f: PFrame, i: Int): Int = f.residuals(i)
}

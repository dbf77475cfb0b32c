package graft.functions

import graft.sources.Flac.{BitReader, BitWriter}

/** GVC — the "graft video codec": a COMPLETE coded video bitstream
  * composed from the three mechanisms the engine already owns and has
  * verified separately, in exactly the shape the h264/vp8 family
  * arranges them (the reference decodes those through libav codec
  * contexts, /root/reference/streamtasks/media/codec.py:50-135; its
  * codec tests pin the mux→demux→decode inverse-transcode loop,
  * tests/media/test_video_codec.py:14-43):
  *
  *  - INTER prediction: [[Motion]]'s full-search SAD block matching
  *    against the reconstructed previous frame (the m28 closed loop);
  *  - INTRA prediction: previous-pixel prediction in block raster
  *    order from the RECONSTRUCTED neighbor (the h264 intra-DC/plane
  *    idea reduced to its drift-free core), first pixel biased at 128;
  *  - ENTROPY coding: per-block Rice/exp-Golomb codes with an optimal
  *    per-block parameter (the p13/FLAC residual coder — h264 CAVLC's
  *    structured-unary family), zigzag signed→unsigned mapping.
  *
  * The bitstream is AVCC shaped — the convention h264 actually uses
  * INSIDE MP4: every NAL-like packet is prefixed by its 4-byte
  * big-endian length (not an Annex-B start code, whose bit pattern a
  * Rice-coded body could reproduce by chance; h264 needs emulation-
  * prevention bytes for exactly that, and length prefixes avoid the
  * whole class). Packet types reuse h264's first-byte values (0x67
  * SPS, 0x65 IDR/I slice, 0x41 non-IDR/P slice). The SPS carries
  * width/height/block/range/q so the decoder is self-contained. Frame
  * payloads are what an MP4 sample carries (m36 muxes them through
  * the classic moov layout).
  *
  * Everything is integer-exact: with q = 1 the closed loop is
  * LOSSLESS (decode == input, byte-for-byte reproducible bit costs —
  * the m36 oracle recomputes every frame's payload size from the same
  * argmin + Rice cost in SQL); with q > 1 it is lossy but drift-free
  * (decoder reconstruction equals the encoder's own reference,
  * CodecSpec pins both).
  */
object Gvc {

  val NalSps = 0x67
  val NalIdr = 0x65
  val NalP = 0x41

  final case class Config(w: Int, h: Int, block: Int, range: Int, q: Int) {
    require(w > 0 && w <= 0xffff && h > 0 && h <= 0xffff, s"frame $w x $h")
    require(w % block == 0 && h % block == 0,
      s"frame $w x $h not divisible by block $block")
    require(block > 0 && block <= 255, s"block $block")
    require(range >= 0 && range <= 3, s"range $range needs <= 3 bits per axis")
    require(q >= 1 && q <= 255, s"q $q")
  }

  @inline private def wrap(v: Int, n: Int): Int = ((v % n) + n) % n

  /** Zigzag signed→unsigned: 0,-1,1,-2,2,… → 0,1,2,3,4,… */
  @inline def zigzag(r: Int): Long = if (r < 0) -2L * r - 1 else 2L * r
  @inline def unzigzag(z: Long): Int =
    (if ((z & 1) == 1) -(z + 1) / 2 else z / 2).toInt

  /** Rice bit cost of one value at parameter k. */
  @inline def riceBits(z: Long, k: Int): Long = (z >> k) + 1 + k

  /** Optimal Rice parameter for a block's zigzagged residuals:
    * k ∈ 0..7 minimizing total bits, ties to the LOWER k (so the
    * choice is a pure integer argmin both engines replicate). */
  def bestK(zs: Array[Long]): Int = {
    var best = 0
    var bestCost = Long.MaxValue
    var k = 0
    while (k <= 7) {
      var c = 0L
      var i = 0
      while (i < zs.length) { c += riceBits(zs(i), k); i += 1 }
      if (c < bestCost) { bestCost = c; best = k }
      k += 1
    }
    best
  }

  private def writeRiceBlock(bw: BitWriter, zs: Array[Long]): Unit = {
    val k = bestK(zs)
    bw.writeBits(k.toLong, 3)
    var i = 0
    while (i < zs.length) {
      bw.writeUnary(zs(i) >> k)
      bw.writeBits(zs(i), k)
      i += 1
    }
  }

  private def readRiceBlock(br: BitReader, n: Int): Array[Long] = {
    val k = br.readBits(3).toInt
    Array.fill(n)((br.readUnary() << k) | br.readBits(k))
  }

  /** Intra-code one frame against its own reconstruction (previous
    * pixel in block raster order, first pixel predicted as 128) —
    * returns (packet body after the NAL byte via `bw`, recon). */
  private def encodeI(cur: Array[Int], cfg: Config, bw: BitWriter)
      : Array[Int] = {
    val recon = new Array[Int](cfg.w * cfg.h)
    val b = cfg.block
    for (by <- 0 until cfg.h / b; bx <- 0 until cfg.w / b) {
      val zs = new Array[Long](b * b)
      var pred = 128
      var i = 0
      var y = 0
      while (y < b) {
        var x = 0
        while (x < b) {
          val idx = (by * b + y) * cfg.w + (bx * b + x)
          val t = quantDiv(cur(idx) - pred, cfg.q)
          zs(i) = zigzag(t)
          recon(idx) = pred + t * cfg.q
          pred = recon(idx)
          i += 1; x += 1
        }
        y += 1
      }
      writeRiceBlock(bw, zs)
    }
    recon
  }

  /** Truncate-toward-zero quotient (the [[Motion.quant]] value divided
    * back down — what actually travels in the bitstream). */
  @inline def quantDiv(r: Int, q: Int): Int =
    if (r < 0) -((-r) / q) else r / q

  private def writeLenPrefixed(os: java.io.ByteArrayOutputStream,
      nal: Array[Byte]): Unit = {
    os.write((nal.length >>> 24) & 0xff); os.write((nal.length >>> 16) & 0xff)
    os.write((nal.length >>> 8) & 0xff); os.write(nal.length & 0xff)
    os.write(nal, 0, nal.length)
  }

  /** Encode a frame sequence. Element 0 is len+SPS + len+I (AVCC
    * length-prefixed); every later element is len+P. Each element is
    * one MP4 sample payload. */
  def encode(frames: Seq[Array[Int]], cfg: Config): Seq[Array[Byte]] = {
    require(frames.nonEmpty, "gvc: no frames")
    frames.foreach(f => require(f.length == cfg.w * cfg.h,
      s"gvc: frame length ${f.length} != ${cfg.w * cfg.h}"))
    val out = Seq.newBuilder[Array[Byte]]
    // SPS
    val sps = new java.io.ByteArrayOutputStream()
    sps.write(NalSps)
    sps.write(cfg.w >> 8); sps.write(cfg.w & 0xff)
    sps.write(cfg.h >> 8); sps.write(cfg.h & 0xff)
    sps.write(cfg.block); sps.write(cfg.range); sps.write(cfg.q)
    // I frame
    val ibw = new BitWriter
    var recon = encodeI(frames.head, cfg, ibw)
    val ibody = ibw.toBytes
    val inal = new java.io.ByteArrayOutputStream()
    inal.write(NalIdr); inal.write(ibody, 0, ibody.length)
    val first = new java.io.ByteArrayOutputStream()
    writeLenPrefixed(first, sps.toByteArray)
    writeLenPrefixed(first, inal.toByteArray)
    out += first.toByteArray
    // P frames
    val b = cfg.block
    frames.tail.foreach { cur =>
      val (pf, rec) = Motion.encodeP(cur, recon, cfg.w, cfg.h, b,
        cfg.range, cfg.q)
      recon = rec
      val bw = new BitWriter
      pf.mvs.foreach { mv =>
        bw.writeBits((mv.dx + cfg.range).toLong, 3)
        bw.writeBits((mv.dy + cfg.range).toLong, 3)
        val zs = new Array[Long](b * b)
        var i = 0
        var y = 0
        while (y < b) {
          var x = 0
          while (x < b) {
            val idx = (mv.by * b + y) * cfg.w + (mv.bx * b + x)
            zs(i) = zigzag(pf.residuals(idx) / cfg.q)
            i += 1; x += 1
          }
          y += 1
        }
        writeRiceBlock(bw, zs)
      }
      val body = bw.toBytes
      val nal = new java.io.ByteArrayOutputStream()
      nal.write(NalP); nal.write(body, 0, body.length)
      val pkt = new java.io.ByteArrayOutputStream()
      writeLenPrefixed(pkt, nal.toByteArray)
      out += pkt.toByteArray
    }
    out.result()
  }

  private def splitNals(payload: Array[Byte]): Seq[(Int, Int)] = {
    // AVCC walk: (start, end) byte ranges after each 4-byte length
    val cuts = Seq.newBuilder[(Int, Int)]
    var i = 0
    while (i < payload.length) {
      require(i + 4 <= payload.length, "gvc: truncated NAL length prefix")
      val len = ((payload(i) & 0xff) << 24) | ((payload(i + 1) & 0xff) << 16) |
        ((payload(i + 2) & 0xff) << 8) | (payload(i + 3) & 0xff)
      require(len > 0 && i + 4 + len <= payload.length,
        s"gvc: NAL length $len overruns the sample at offset $i")
      cuts += ((i + 4, i + 4 + len))
      i += 4 + len
    }
    val cs = cuts.result()
    require(cs.nonEmpty, "gvc: empty sample payload")
    cs
  }

  /** Decode the packet sequence produced by [[encode]] (possibly
    * recovered from a container round trip). */
  def decode(packets: Seq[Array[Byte]]): (Config, Seq[Array[Int]]) = {
    require(packets.nonEmpty, "gvc: no packets")
    var cfg: Config = null
    var recon: Array[Int] = null
    val frames = Seq.newBuilder[Array[Int]]
    packets.foreach { payload =>
      splitNals(payload).foreach { case (s, e) =>
        val nal = payload(s) & 0xff
        nal match {
          case NalSps =>
            require(e - s == 8, s"gvc: SPS length ${e - s}")
            cfg = Config(
              ((payload(s + 1) & 0xff) << 8) | (payload(s + 2) & 0xff),
              ((payload(s + 3) & 0xff) << 8) | (payload(s + 4) & 0xff),
              payload(s + 5) & 0xff, payload(s + 6) & 0xff,
              payload(s + 7) & 0xff)
          case NalIdr =>
            require(cfg != null, "gvc: I slice before SPS")
            val br = new BitReader(payload, s + 1, e)
            val out = new Array[Int](cfg.w * cfg.h)
            val b = cfg.block
            for (by <- 0 until cfg.h / b; bx <- 0 until cfg.w / b) {
              val zs = readRiceBlock(br, b * b)
              var pred = 128
              var i = 0
              var y = 0
              while (y < b) {
                var x = 0
                while (x < b) {
                  val idx = (by * b + y) * cfg.w + (bx * b + x)
                  out(idx) = pred + unzigzag(zs(i)) * cfg.q
                  pred = out(idx)
                  i += 1; x += 1
                }
                y += 1
              }
            }
            recon = out
            frames += out
          case NalP =>
            require(cfg != null && recon != null, "gvc: P slice before I")
            val br = new BitReader(payload, s + 1, e)
            val out = new Array[Int](cfg.w * cfg.h)
            val b = cfg.block
            for (by <- 0 until cfg.h / b; bx <- 0 until cfg.w / b) {
              val dx = br.readBits(3).toInt - cfg.range
              val dy = br.readBits(3).toInt - cfg.range
              val zs = readRiceBlock(br, b * b)
              var i = 0
              var y = 0
              while (y < b) {
                val cy = by * b + y
                val ry = wrap(cy + dy, cfg.h)
                var x = 0
                while (x < b) {
                  val cx = bx * b + x
                  val rx = wrap(cx + dx, cfg.w)
                  out(cy * cfg.w + cx) =
                    recon(ry * cfg.w + rx) + unzigzag(zs(i)) * cfg.q
                  i += 1; x += 1
                }
                y += 1
              }
            }
            recon = out
            frames += out
          case other =>
            throw new IllegalArgumentException(f"gvc: unknown NAL 0x$other%02x")
        }
      }
    }
    require(cfg != null, "gvc: no SPS in stream")
    (cfg, frames.result())
  }
}

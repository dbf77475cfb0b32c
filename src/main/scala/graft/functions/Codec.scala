package graft.functions

/** Pluggable media codec mount (SURVEY §2.2 #25-30, §7.3: "media
  * codecs/containers… binary columns + pluggable JVM kernels behind a
  * trait"). The real libav-backed encoders/decoders
  * (/root/reference/streamtasks/media/codec.py:50-135) are out of
  * analytic scope and their libraries are not in this container; the
  * trait fixes the seam where a JavaCV/ffmpeg binding mounts, and the
  * shipped implementations cover what IS computable in pure JVM:
  * passthrough ("raw codec") and pixel-format swizzles (the video
  * reformatter's format conversion, media/videoreformatter.py:39-54).
  *
  * Usage shape: `ds.mapPartitions { rows => val c = codec.open(); … }`
  * — one context per partition, as MultimodalQueries m03 demonstrates.
  */
trait Codec extends Serializable {
  def name: String
  /** Encode one raw frame/chunk to the codec's byte format. */
  def encode(raw: Array[Byte]): Array[Byte]
  /** Decode one packet back to raw bytes. */
  def decode(packet: Array[Byte]): Array[Byte]
}

object Codec {

  /** The "raw" codec — identity both ways (codec.py's raw path). */
  case object Raw extends Codec {
    val name = "raw"
    def encode(raw: Array[Byte]): Array[Byte] = raw
    def decode(packet: Array[Byte]): Array[Byte] = packet
  }

  /** G.711 μ-law (ITU-T G.711): a REAL audio codec in pure integer
    * math — 16-bit PCM ↔ 8-bit companded, the telephony codec every
    * audio stack ships. Encode: sign + 3-bit segment (exponent) +
    * 4-bit mantissa, bias 132, clip 32635, ones-complemented; decode
    * is the exact segment expansion. The per-sample math is also
    * expressed as Column/SQL integer expressions in DspQueries.p07 so
    * the DuckDB oracle hash-checks it; CodecSpec pins kernel ==
    * column formulation over the full 16-bit domain.
    *
    * Known G.711 quirk kept: 0x7F (negative zero) and 0xFF (positive
    * zero) both decode to 0, so re-encoding maps 0x7F → 0xFF. */
  case object MuLaw extends Codec {
    val name = "g711-mulaw"
    final val Bias = 132
    final val Clip = 32635

    def encodeSample(x: Int): Int = {
      val sign = if (x < 0) 128 else 0
      val ax = math.min(math.abs(x), Clip) + Bias
      var e = 0
      var th = 256
      while (e < 7 && ax >= th) { e += 1; th <<= 1 }
      val mant = (ax >> (e + 3)) & 15
      255 - (sign + e * 16 + mant)
    }

    def decodeSample(b: Int): Int = {
      val y = 255 - (b & 0xff)
      val e = (y >> 4) & 7
      val mant = y & 15
      val mag = ((mant * 8 + Bias) << e) - Bias
      if ((y & 0x80) != 0) -mag else mag
    }

    /** s16le frame → one μ-law byte per sample. */
    def encode(raw: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](raw.length / 2)
      var i = 0
      while (i < out.length) {
        val s = ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff)).toShort.toInt
        out(i) = encodeSample(s).toByte
        i += 1
      }
      out
    }

    /** μ-law bytes → s16le frame. */
    def decode(packet: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](packet.length * 2)
      var i = 0
      while (i < packet.length) {
        val s = decodeSample(packet(i) & 0xff)
        out(2 * i) = (s & 0xff).toByte
        out(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      out
    }
  }

  /** PNG — a REAL pluggable image codec through the seam, backed by
    * the JDK's own javax.imageio (no external dependency): rgb24
    * frames ↔ PNG packets, losslessly (PNG's DEFLATE+filter pipeline
    * is exact), so the reference's codec round-trip property
    * (tests/media/test_audio_codec.py:10-28 — decode(encode(x))
    * recovers x) holds BIT-EXACTLY here. Configured with frame
    * dimensions at construction, like the reference opens its video
    * codecs with a resolution (media/codec.py:50-135); one instance
    * per partition via the same mapPartitions mount m03 uses —
    * CodecSpec drives exactly that mount. Proves the seam is
    * load-bearing: a JavaCV/ffmpeg binding mounts the same way. */
  final case class Png(w: Int, h: Int) extends Codec {
    val name = "png"

    def encode(raw: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(rgb24ToImage(raw, w, h), "png", bos)
      bos.toByteArray
    }

    def decode(packet: Array[Byte]): Array[Byte] =
      imageToRgb24(readImage(packet, name), w, h)
  }

  /** ImageIO.read returns NULL (not an exception) for bytes it cannot
    * decode — surface a diagnostic instead of an NPE downstream. */
  private def readImage(packet: Array[Byte],
      codec: String): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(packet))
    require(img != null, s"$codec: undecodable image packet " +
      s"(${packet.length}B)")
    img
  }

  /** rgb24 bytes → a TYPE_3BYTE_BGR image (the raster's native order). */
  private def rgb24ToImage(raw: Array[Byte], w: Int,
      h: Int): java.awt.image.BufferedImage = {
    require(raw.length == w * h * 3, s"rgb24 frame must be ${w * h * 3}B")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val buf = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var i = 0
    while (i < w * h) {
      buf(3 * i) = raw(3 * i + 2)
      buf(3 * i + 1) = raw(3 * i + 1)
      buf(3 * i + 2) = raw(3 * i)
      i += 1
    }
    img
  }

  /** Any source raster layout → rgb24 bytes (dimension-checked). */
  private def imageToRgb24(img: java.awt.image.BufferedImage, w: Int,
      h: Int): Array[Byte] = {
    require(img.getWidth == w && img.getHeight == h,
      s"decoded ${img.getWidth}x${img.getHeight}, expected ${w}x$h")
    val out = new Array[Byte](w * h * 3)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        out(i) = ((rgb >> 16) & 0xff).toByte
        out(i + 1) = ((rgb >> 8) & 0xff).toByte
        out(i + 2) = (rgb & 0xff).toByte
        i += 3; x += 1
      }
      y += 1
    }
    out
  }

  /** IMA ADPCM (DVI4, IMA standard step/index tables): a REAL LOSSY
    * audio codec in pure integer math — 16-bit PCM ↔ 4-bit nibbles
    * (4× compression) through a per-stream (predictor, step index)
    * state machine, the adaptive-quantization structure every
    * waveform codec shares. The encoder tracks the DECODER's
    * reconstruction (vpdiff accumulates exactly the decoder's
    * expansion), so decode(encode(x)) is the deterministic predictor
    * sequence — which p10's DuckDB oracle recomputes independently
    * with a recursive CTE over the same integer tables, putting a
    * STATEFUL lossy codec under the exact hash gate (the stateless
    * μ-law precedent is p07). CodecSpec pins SNR and packing.
    * Mirrors the reference's transcode matrix role for audio
    * (tests/media/test_audio_codec.py:10-28). */
  object ImaAdpcm extends Codec {
    val name = "ima-adpcm"
    val StepTable: Array[Int] = Array(
      7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
      34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
      143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
      494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
      1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
      4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
      11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
      27086, 29794, 32767)
    val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

    /** One encode step: (sample, predictor, index) →
      * (nibble, predictor', index'). predictor' IS the decoded
      * sample — the encoder's copy of the decoder. */
    def encodeStep(sample: Int, predictor: Int, index: Int): (Int, Int, Int) = {
      val step = StepTable(index)
      var diff = sample - predictor
      val sign = if (diff < 0) 8 else 0
      if (sign != 0) diff = -diff
      var delta = 0
      var vpdiff = step >> 3
      if (diff >= step) { delta = 4; diff -= step; vpdiff += step }
      if (diff >= (step >> 1)) { delta |= 2; diff -= step >> 1; vpdiff += step >> 1 }
      if (diff >= (step >> 2)) { delta |= 1; vpdiff += step >> 2 }
      val p = if (sign != 0) predictor - vpdiff else predictor + vpdiff
      val p1 = math.max(-32768, math.min(32767, p))
      val i1 = math.max(0, math.min(88, index + IndexTable(delta)))
      (sign | delta, p1, i1)
    }

    /** One decode step: (nibble, predictor, index) →
      * (sample, predictor', index'). */
    def decodeStep(nibble: Int, predictor: Int, index: Int): (Int, Int, Int) = {
      val step = StepTable(index)
      val delta = nibble & 7
      var vpdiff = step >> 3
      if ((delta & 4) != 0) vpdiff += step
      if ((delta & 2) != 0) vpdiff += step >> 1
      if ((delta & 1) != 0) vpdiff += step >> 2
      val p = if ((nibble & 8) != 0) predictor - vpdiff else predictor + vpdiff
      val p1 = math.max(-32768, math.min(32767, p))
      val i1 = math.max(0, math.min(88, index + IndexTable(delta)))
      (p1, p1, i1)
    }

    def encodeSamples(xs: Array[Int]): Array[Byte] = {
      val nib = new Array[Int](xs.length)
      var pred = 0; var idx = 0; var i = 0
      while (i < xs.length) {
        val (n, p, ix) = encodeStep(xs(i), pred, idx)
        nib(i) = n; pred = p; idx = ix; i += 1
      }
      val out = new Array[Byte]((xs.length + 1) / 2)
      i = 0
      while (i < xs.length) {
        val lo = nib(i)
        val hi = if (i + 1 < xs.length) nib(i + 1) else 0
        out(i / 2) = (lo | (hi << 4)).toByte
        i += 2
      }
      out
    }

    def decodeSamples(packet: Array[Byte], n: Int): Array[Int] = {
      val out = new Array[Int](n)
      var pred = 0; var idx = 0; var i = 0
      while (i < n) {
        val b = packet(i / 2) & 0xff
        val nib = if (i % 2 == 0) b & 0xf else b >> 4
        val (s, p, ix) = decodeStep(nib, pred, idx)
        out(i) = s; pred = p; idx = ix; i += 1
      }
      out
    }

    /** s16le frame → [n:int32le][packed nibbles] (the packet carries
      * its sample count, like any framed codec payload). */
    def encode(raw: Array[Byte]): Array[Byte] = {
      val n = raw.length / 2
      val xs = new Array[Int](n)
      var i = 0
      while (i < n) {
        xs(i) = ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff)).toShort.toInt
        i += 1
      }
      val body = encodeSamples(xs)
      val out = new Array[Byte](4 + body.length)
      out(0) = (n & 0xff).toByte; out(1) = ((n >> 8) & 0xff).toByte
      out(2) = ((n >> 16) & 0xff).toByte; out(3) = ((n >> 24) & 0xff).toByte
      System.arraycopy(body, 0, out, 4, body.length)
      out
    }

    def decode(packet: Array[Byte]): Array[Byte] = {
      require(packet.length >= 4, s"ADPCM packet of ${packet.length}B")
      val n = (packet(0) & 0xff) | ((packet(1) & 0xff) << 8) |
        ((packet(2) & 0xff) << 16) | ((packet(3) & 0xff) << 24)
      // bound by the BODY, not the header: a corrupt count would index
      // past the nibbles (or negative-allocate) with a bare JVM error
      require(n >= 0 && (n + 1) / 2 <= packet.length - 4,
        s"ADPCM sample count $n exceeds the ${packet.length - 4}B body")
      val xs = decodeSamples(java.util.Arrays.copyOfRange(
        packet, 4, packet.length), n)
      val out = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        out(2 * i) = (xs(i) & 0xff).toByte
        out(2 * i + 1) = ((xs(i) >> 8) & 0xff).toByte
        i += 1
      }
      out
    }
  }

  /** JPEG — a REAL LOSSY image codec through the seam, backed by the
    * JDK's javax.imageio JPEG writer with an EXPLICIT quality (fixed
    * quantization tables scaled by it — deterministic bytes for a
    * given JDK): rgb24 frames → DCT-quantized packets → rgb24. The
    * reference's inverse-transcode property
    * (tests/media/test_video_codec.py:14-43 — decode(encode(x)) close
    * to x) becomes a PSNR bound here (CodecSpec pins it; m14 runs the
    * encode→decode→PSNR property under the driver's oracle gate). */
  final case class Jpeg(w: Int, h: Int, quality: Float = 0.75f) extends Codec {
    val name = "jpeg"

    def encode(raw: Array[Byte]): Array[Byte] = {
      val img = rgb24ToImage(raw, w, h)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpeg").next()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(quality)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }

    def decode(packet: Array[Byte]): Array[Byte] =
      imageToRgb24(readImage(packet, name), w, h)
  }

  /** Inter-frame delta codec — the keyframe/P-frame structure every
    * video encoder emits (media/videoencoder.py ensures keyframe
    * flags; packet.py:6-36 carries `is_keyframe`): a keyframe stores
    * the raw frame; a P-frame stores per-byte differences vs the
    * previous RECONSTRUCTED frame, mod 256 (lossless here, so
    * reconstructed == source). Decode folds deltas from the last
    * keyframe. The per-pixel math is also expressed as Column/SQL
    * integer expressions in MultimodalQueries.m09 so the DuckDB
    * oracle hash-checks it; CodecSpec pins kernel == formula. */
  object Delta {
    val name = "frame-delta"

    /** P-frame encode: (cur − prev) mod 256 per byte. */
    def encodeP(cur: Array[Byte], prev: Array[Byte]): Array[Byte] = {
      require(cur.length == prev.length, "frame size changed mid-GOP")
      val out = new Array[Byte](cur.length)
      var i = 0
      while (i < out.length) {
        out(i) = ((cur(i) - prev(i)) & 0xff).toByte
        i += 1
      }
      out
    }

    /** P-frame decode: (prev + delta) mod 256 per byte. */
    def decodeP(delta: Array[Byte], prev: Array[Byte]): Array[Byte] = {
      require(delta.length == prev.length, "frame size changed mid-GOP")
      val out = new Array[Byte](delta.length)
      var i = 0
      while (i < out.length) {
        out(i) = ((prev(i) + delta(i)) & 0xff).toByte
        i += 1
      }
      out
    }

    /** Encode a group of pictures: frame 0 is the keyframe (stored
      * raw), the rest are successive P-frames. */
    def encodeGop(frames: Seq[Array[Byte]]): Seq[Array[Byte]] =
      frames.headOption.toSeq ++
        frames.sliding(2).collect { case Seq(p, c) => encodeP(c, p) }

    /** Decode a group of pictures back to raw frames. */
    def decodeGop(packets: Seq[Array[Byte]]): Seq[Array[Byte]] =
      packets.headOption.map { key =>
        packets.tail.scanLeft(key)((prev, d) => decodeP(d, prev))
      }.getOrElse(Seq.empty)
  }

  /** Pixel-format reformatter: RGBA ↔ BGRA channel swizzle — the
    * pure-JVM slice of the video reformatter; encode/decode are
    * inverses (the round-trip property the reference's codec tests
    * assert, tests/media/test_video_codec.py). */
  case object RgbaBgra extends Codec {
    val name = "rgba<->bgra"
    private def swizzle(b: Array[Byte]): Array[Byte] = {
      val out = b.clone()
      var i = 0
      while (i + 3 < out.length) {
        val r = out(i); out(i) = out(i + 2); out(i + 2) = r
        i += 4
      }
      out
    }
    def encode(raw: Array[Byte]): Array[Byte] = swizzle(raw)
    def decode(packet: Array[Byte]): Array[Byte] = swizzle(packet)
  }

  /** MDCT transform codec — the FREQUENCY-DOMAIN lossy audio shape
    * (AAC / Vorbis / Opus-CELT all share it: lapped MDCT analysis, a
    * per-block scalefactor, uniform coefficient quantization, lapped
    * synthesis with overlap-add), in pure JVM math. Complements the
    * WAVEFORM codecs behind this trait (μ-law = stateless companding,
    * IMA ADPCM = adaptive differential): together the three cover the
    * structural families of real audio codecs.
    *
    *  - Analysis: sine-window MDCT over 2N-sample lapped blocks
    *    advancing by N (Princen–Bradley / TDAC: the sine window
    *    satisfies w²[n] + w²[n+N] = 1, so synthesis overlap-add
    *    reconstructs EXACTLY absent quantization — CodecSpec pins
    *    that property directly on the double-precision path, so the
    *    codec's only loss is the quantizer).
    *  - Quantization: per block, scale s = smallest power of two
    *    putting max|X_k|/(qstep·2^s) inside int8; coefficients store
    *    as round(X_k/step) ∈ [−127,127] — N+1 bytes per N samples,
    *    ~2:1 vs s16le (real transform codecs add entropy coding for
    *    another 2–4×; the quantized-coefficient layout is the shape
    *    the property tests need).
    *  - Packet: [n:int32le][blocks:int32le][(scale:byte, N coeffs)*].
    *
    * Deterministic: same JVM double trig on identical inputs; encode
    * is bit-stable (CodecSpec). p11 runs decode(encode(x)) under the
    * driver's oracle gate via the inverse-transcode SNR property, the
    * same harness as the reference's codec matrix
    * (tests/media/test_audio_codec.py:10-28). */
  final case class Mdct(frameN: Int = 128, qstep: Double = 12.0)
      extends Codec {
    val name = s"mdct-$frameN"
    private val n2 = 2 * frameN

    private lazy val cosT: Array[Array[Double]] =
      Array.tabulate(frameN, n2) { (k, n) =>
        math.cos(math.Pi / frameN * (n + 0.5 + frameN / 2.0) * (k + 0.5))
      }
    private lazy val win: Array[Double] =
      Array.tabulate(n2)(n => math.sin(math.Pi / n2 * (n + 0.5)))

    /** Forward MDCT of one windowed 2N block → N coefficients. */
    def forward(x: Array[Double]): Array[Double] = {
      val out = new Array[Double](frameN)
      var k = 0
      while (k < frameN) {
        val row = cosT(k)
        var s = 0.0; var n = 0
        while (n < n2) { s += win(n) * x(n) * row(n); n += 1 }
        out(k) = s; k += 1
      }
      out
    }

    /** Inverse MDCT of N coefficients → one windowed 2N block
      * (overlap-add two shifted blocks to reconstruct). */
    def inverse(coef: Array[Double]): Array[Double] = {
      val out = new Array[Double](n2)
      var n = 0
      while (n < n2) {
        var s = 0.0; var k = 0
        while (k < frameN) { s += coef(k) * cosT(k)(n); k += 1 }
        out(n) = 2.0 / frameN * win(n) * s
        n += 1
      }
      out
    }

    def encode(raw: Array[Byte]): Array[Byte] = {
      val n = raw.length / 2
      val mPad = ((n + frameN - 1) / frameN) * frameN
      // leading + trailing N-sample zero pads so every real sample is
      // covered by exactly two lapped blocks
      val x = new Array[Double](mPad + 2 * frameN)
      var i = 0
      while (i < n) {
        x(i + frameN) =
          ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff)).toShort.toDouble
        i += 1
      }
      val blocks = mPad / frameN + 1
      val out = new Array[Byte](8 + blocks * (1 + frameN))
      out(0) = (n & 0xff).toByte; out(1) = ((n >> 8) & 0xff).toByte
      out(2) = ((n >> 16) & 0xff).toByte; out(3) = ((n >> 24) & 0xff).toByte
      out(4) = (blocks & 0xff).toByte; out(5) = ((blocks >> 8) & 0xff).toByte
      out(6) = ((blocks >> 16) & 0xff).toByte
      out(7) = ((blocks >> 24) & 0xff).toByte
      var b = 0
      var o = 8
      val block = new Array[Double](n2)
      while (b < blocks) {
        System.arraycopy(x, b * frameN, block, 0, n2)
        val c = forward(block)
        var m = 0.0
        var k = 0
        while (k < frameN) { val a = math.abs(c(k)); if (a > m) m = a; k += 1 }
        var s = 0
        while (m / (qstep * (1L << s)) > 127.0 && s < 30) s += 1
        val step = qstep * (1L << s)
        out(o) = s.toByte; o += 1
        k = 0
        while (k < frameN) {
          val q = math.max(-127, math.min(127, math.round(c(k) / step).toInt))
          out(o) = q.toByte; o += 1; k += 1
        }
        b += 1
      }
      out
    }

    def decode(packet: Array[Byte]): Array[Byte] = {
      require(packet.length >= 8, s"MDCT packet of ${packet.length}B")
      val n = (packet(0) & 0xff) | ((packet(1) & 0xff) << 8) |
        ((packet(2) & 0xff) << 16) | ((packet(3) & 0xff) << 24)
      val blocks = (packet(4) & 0xff) | ((packet(5) & 0xff) << 8) |
        ((packet(6) & 0xff) << 16) | ((packet(7) & 0xff) << 24)
      // bound by the BODY: each block is 1 scalefactor + frameN codes;
      // a corrupt header would walk off the packet or negative-allocate
      require(blocks >= 1 && n >= 0 &&
        8L + blocks.toLong * (1 + frameN) <= packet.length,
        s"MDCT header ($blocks blocks, $n samples) exceeds the " +
          s"${packet.length}B packet")
      val mPad = (blocks - 1) * frameN
      val y = new Array[Double](mPad + 2 * frameN)
      val coef = new Array[Double](frameN)
      var b = 0
      var o = 8
      while (b < blocks) {
        val step = qstep * (1L << (packet(o) & 0xff)); o += 1
        var k = 0
        while (k < frameN) { coef(k) = packet(o).toDouble * step; o += 1; k += 1 }
        val inv = inverse(coef)
        val off = b * frameN
        k = 0
        while (k < n2) { y(off + k) += inv(k); k += 1 }
        b += 1
      }
      val out = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val v = math.max(-32768,
          math.min(32767, math.round(y(i + frameN)).toInt))
        out(2 * i) = (v & 0xff).toByte
        out(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      out
    }
  }
}

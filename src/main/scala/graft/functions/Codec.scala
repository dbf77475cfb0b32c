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
      require(raw.length == w * h * 3, s"rgb24 frame must be ${w * h * 3}B")
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val buf = img.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferByte].getData
      var i = 0
      while (i < w * h) { // rgb24 → the raster's native BGR order
        buf(3 * i) = raw(3 * i + 2)
        buf(3 * i + 1) = raw(3 * i + 1)
        buf(3 * i + 2) = raw(3 * i)
        i += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    def decode(packet: Array[Byte]): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(packet))
      require(img.getWidth == w && img.getHeight == h,
        s"decoded ${img.getWidth}x${img.getHeight}, expected ${w}x$h")
      val out = new Array[Byte](w * h * 3)
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { // any source raster layout → rgb24
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
}

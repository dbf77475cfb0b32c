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

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

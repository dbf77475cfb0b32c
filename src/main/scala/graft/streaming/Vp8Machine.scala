package graft.streaming

import graft.functions.Vp8
import graft.sources.Ivf
import graft.streaming.StateMachines.{Ev, Machine, Out}

/** VP8 decode as a STATEFUL STREAMING OPERATOR — what a live ingest
  * pipeline actually needs from a codec: frames arrive one micro-batch
  * at a time, and the decoder's reference state (the LAST and GOLDEN
  * planes plus stream dimensions, RFC 6386 §16.3's buffer model)
  * crosses batch boundaries through the state store exactly like any
  * other operator state. Keyframes (re-)anchor both buffers; inter
  * frames read LAST/GOLDEN and refresh LAST — the refresh_golden = 0
  * subset [[graft.functions.Vp8]] implements.
  *
  * The payload rides the envelope's `text` field hex-encoded (the
  * envelope is a NumberMessage/TextMessage shape, not a byte one);
  * emits carry Σluma in `value` and "Σchroma,kf" in `text`. Purity
  * (state, event) → (state, emits) gives batch/streaming parity for
  * free, and the per-key state is ~10 KB of planes at 32×32 — a
  * RocksDB state-store entry, not a broadcast.
  */
object Vp8Machine {

  final case class DecState(w: Int, h: Int,
      lastY: Array[Int], lastU: Array[Int], lastV: Array[Int],
      goldY: Array[Int], goldU: Array[Int], goldV: Array[Int])

  final class StreamDecoder extends Machine[DecState] {
    def init: DecState = DecState(0, 0, null, null, null, null, null, null)

    def step(s: DecState, e: Ev): (DecState, Seq[Out]) = {
      val payload = java.util.HexFormat.of().parseHex(e.text)
      val tag = Ivf.parseVp8Tag(payload)
      if (tag.keyframe) {
        val dec = Vp8.decode(payload)
        val ns = DecState(dec.frame.width, dec.frame.height,
          dec.y, dec.u, dec.v, dec.y, dec.u, dec.v)
        (ns, Seq(emit(e.ts, dec.y, dec.u, dec.v, keyframe = true)))
      } else {
        require(s.lastY != null,
          s"vp8 stream: inter frame at ts ${e.ts} before any keyframe")
        val dec = Vp8.decodeInter(payload, s.w, s.h,
          s.lastY, s.lastU, s.lastV, s.goldY, s.goldU, s.goldV)
        (s.copy(lastY = dec.y, lastU = dec.u, lastV = dec.v),
          Seq(emit(e.ts, dec.y, dec.u, dec.v, keyframe = false)))
      }
    }

    private def emit(ts: Long, y: Array[Int], u: Array[Int],
        v: Array[Int], keyframe: Boolean): Out = {
      val luma = y.iterator.map(_.toLong).sum
      val chroma = u.iterator.map(_.toLong).sum +
        v.iterator.map(_.toLong).sum
      Out(ts, luma.toDouble, s"$chroma,${if (keyframe) 1 else 0}")
    }
  }
}

package graft.streaming

import graft.sources.{Aac, AacPcm, AudioIndex}
import graft.streaming.StateMachines.{Ev, Machine, Out}

/** AAC decode-to-samples as a STATEFUL STREAMING OPERATOR — p32's
  * streaming twin and the AAC member of the e53–e57 decode family:
  * ADTS frames arrive one micro-batch at a time, and §4.6.11's 50%
  * overlap-add makes every frame's first 1024 output samples depend
  * on the PREVIOUS frame's windowed IMDCT tail — 1024 Longs of
  * cross-batch state ([[AacPcm.Overlap.flat]], 8 KB per key,
  * CONSTANT by construction) that must survive micro-batch
  * boundaries: dropping it zeroes the tail and desyncs every later
  * frame sum. Payloads ride the envelope's `text` hex-encoded (one
  * ADTS frame each); emits carry the window sequence in `value` and
  * "pcmSum,pcmAlt,pcm0" EXACTLY in `text` (the sums exceed what a
  * Double can carry without rounding on adversarial spectra —
  * the e57 convention). */
object AacMachine {

  final case class OverlapState(tail: Array[Long])

  final class PcmDecoder extends Machine[OverlapState] {
    def init: OverlapState = OverlapState(new Array[Long](1024))

    def step(s: OverlapState, e: Ev): (OverlapState, Seq[Out]) = {
      val payload = java.util.HexFormat.of().parseHex(e.text)
      val frames = AudioIndex.adtsDemux(payload)
      require(frames.size == 1, "aac stream: one ADTS frame per event")
      val (_, ics) = Aac.demuxSce(frames.head._2.payload)
      val overlap = new AacPcm.Overlap()
      overlap.load(s.tail)
      val out = overlap.frame(AacPcm.dequantIcs(ics),
        ics.info.windowSequence)
      var sum = 0L; var alt = 0L
      var i = 0
      while (i < 1024) {
        sum += out(i)
        alt += (if (i % 2 == 1) -out(i) else out(i))
        i += 1
      }
      (OverlapState(overlap.flat),
        Seq(Out(e.ts, ics.info.windowSequence.toDouble,
          s"$sum,$alt,${out(0)}")))
    }
  }
}

package graft

import graft.streaming.StateMachines._
import org.scalatest.funsuite.AnyFunSuite

/** Pure-machine unit tests for the video operator family (the c11
  * deployment's operators plus the mixer/codec kinds): the activity
  * meter's uint8-wraparound arithmetic (videoactivitymeter.py:54-64),
  * the mixer's lazy job submission and control-clears-frame rules
  * (videomixer.py:101-128), and the delta-GOP codec round-trip
  * (videoencoder.py / videodecoder.py on Codec.Delta).
  */
class VideoMachinesSpec extends AnyFunSuite {

  private def run[S](m: Machine[S], evs: Seq[Ev]): Seq[Out] = {
    var s = m.init
    evs.flatMap { e => val (s1, out) = m.step(s, e); s = s1; out }
  }

  private def frame(ts: Long, hex: String, topic: Int = 0) =
    Ev(topic, ts, Double.NaN, hex, paused = false)

  test("activity meter: mean((prev - cur) mod 256) — the reference's " +
      "exact uint8 wraparound, NOT |prev - cur|") {
    val m = new ActivityMeter
    // prev = 0x10, cur = 0x20: (0x10 - 0x20) mod 256 = 0xF0 = 240 —
    // the wraparound value, where |diff| would give 16
    val out = run(m, Seq(frame(0, "10"), frame(1, "20"), frame(2, "10")))
    assert(out.map(_.value) == Seq(240.0, 16.0))
    assert(out.map(_.ts) == Seq(1L, 2L))
  }

  test("activity meter: first frame emits nothing; held frame " +
      "survives a pause (run_sync never clears last_bitmap)") {
    val m = new ActivityMeter
    val out = run(m, Seq(
      frame(0, "0a0a"),
      Ev(0, 1, 1.0, null, paused = true),  // pause: zero + marker
      Ev(0, 2, 0.0, null, paused = true),  // resume: marker only
      frame(3, "0b0c")))                   // diff vs frame 0, not reset
    assert(out == Seq(
      Out(1, 0.0, null),
      Out(1, 1.0, null, paused = true),
      Out(2, 0.0, null, paused = true),
      Out(3, ((0x0a - 0x0b) & 0xFF, (0x0a - 0x0c) & 0xFF) match {
        case (a, b) => (a + b) / 2.0
      }, null)))
  }

  test("video mixer: a second unblended arrival on a track submits the " +
      "mix of the PREVIOUS snapshot at the min timestamp") {
    val m = new VideoMixer(2)
    // opaque 1-px ARGB layers (alphaFront: alpha is byte 0): an
    // opaque later layer fully replaces the colour channels
    val red = "ffff0000"
    val blue = "ff0000ff"
    val out = run(m, Seq(
      frame(10, red, topic = 0),   // first arrival: empty mix, no emit
      frame(12, blue, topic = 1),  // fc moved on at track 0's arrival: no submit
      frame(20, red, topic = 0),   // track 0 unblended → mix {red@10, blue@12}
      frame(22, blue, topic = 1),  // fc moved on again: no submit
      frame(30, red, topic = 0)))  // track 0 unblended → mix {red@20, blue@22}
    assert(out.map(_.ts) == Seq(10L, 20L))
    assert(out.map(_.text) == Seq(blue, blue)) // alpha-front: last layer wins
  }

  test("video mixer: a control message clears the track's held frame " +
      "(videomixer.py:107 — pause AND resume)") {
    val m = new VideoMixer(2)
    val out = run(m, Seq(
      frame(10, "ffff0000", topic = 0),
      frame(12, "ff0000ff", topic = 1),
      Ev(1, 13, 1.0, null, paused = true), // clears track 1's frame
      frame(20, "ff00ff00", topic = 0)))   // mix = track 0 only
    assert(out.map(_.text) == Seq("ffff0000"))
    assert(out.map(_.ts) == Seq(10L))
  }

  test("delta codec: encoder tags I/P frames on the GOP boundary and " +
      "the decoder reconstructs every frame exactly") {
    val enc = new DeltaEncoder(gop = 2)
    val frames = Seq("00112233", "0011ff33", "a0b1c2d3", "a0b1c2ff")
    val encoded = run(enc, frames.zipWithIndex.map { case (h, i) =>
      frame(i.toLong, h) })
    assert(encoded.map(_.text.charAt(0)) == Seq('k', 'p', 'k', 'p'))
    val dec = new DeltaDecoder
    val decoded = run(dec, encoded.zipWithIndex.map { case (o, i) =>
      frame(i.toLong, o.text) })
    assert(decoded.map(_.text) == frames)
  }

  test("delta decoder: a P-frame with no reference errors loudly") {
    val dec = new DeltaDecoder
    val e = intercept[IllegalArgumentException] {
      run(dec, Seq(frame(0, "p|00ff")))
    }
    assert(e.getMessage.contains("no reference"))
  }

  test("loader: the video kinds load with the reference's config field " +
      "names and round-trip write -> load -> write as a fixpoint") {
    import graft.plans.{DeploymentJson, Pipeline}
    import graft.plans.Pipeline._
    val dep = Deployment("video", Seq(
      TaskSpec("cam", SourceOp(IOMeta.video), Nil, "raw"),
      TaskSpec("cam2", SourceOp(IOMeta.video), Nil, "raw2"),
      TaskSpec("txt", SourceOp(IOMeta.text), Nil, "label"),
      TaskSpec("ticks", SourceOp(IOMeta(Map("type" -> "ts"))), Nil, "tick"),
      TaskSpec("fmt", VideoReformatterOp, Seq("raw"), "bgra"),
      TaskSpec("lay", VideoLayoutOp(4, 4, 2, 2, 1, 1, 4, 4), Seq("bgra"),
        "placed"),
      TaskSpec("mix", VideoMixerOp(2, alphaFront = false), Seq("placed",
        "raw2"), "mixed"),
      TaskSpec("enc", VideoEncoderOp(4), Seq("mixed"), "packets"),
      TaskSpec("dec", VideoDecoderOp, Seq("packets"), "frames2"),
      TaskSpec("meter", VideoActivityMeterOp, Seq("frames2"), "act"),
      TaskSpec("render", TextRendererOp(16, 8, 0, 0, 0xffffff),
        Seq("label"), "overlay"),
      TaskSpec("logo", ImageRendererOp("00ff00ff"), Seq("tick"), "logo_v"),
      TaskSpec("out", NamedOutputOp("act", IOMeta.number), Seq("act"), Nil)))
    assert(Pipeline.validate(dep).isEmpty)
    val json = DeploymentJson.write(dep)
    val loaded = DeploymentJson.load(json)
    assert(DeploymentJson.write(loaded.deployment) == json)
    val ops = loaded.deployment.tasks.map(t => t.name -> t.op).toMap
    assert(ops("lay") == VideoLayoutOp(4, 4, 2, 2, 1, 1, 4, 4))
    // alphaFront survives the store (pixel_format argb/bgra)
    assert(ops("mix") == VideoMixerOp(2, alphaFront = false))
    assert(ops("enc") == VideoEncoderOp(4))
    assert(ops("render") == TextRendererOp(16, 8, 0, 0, 0xffffff))
    assert(ops("logo") == ImageRendererOp("00ff00ff"))
    assert(Pipeline.validate(loaded.deployment).isEmpty)
  }
}

package graft

import graft.streaming.StateMachines._
import org.scalatest.funsuite.AnyFunSuite

/** Pure-machine unit tests for the audio operator family (the c12
  * deployment's operators): the mixer's startup barrier, aligned sum,
  * gap-fill and blocked tail (audiomixer.py:100-120), the IMA-ADPCM
  * predictor chain (audioencoder.py / audiodecoder.py on
  * Codec.ImaAdpcm), and the resampler's rational grid
  * (audioresampler.py:22-52).
  */
class AudioMachinesSpec extends AnyFunSuite {

  private def run[S](m: Machine[S], evs: Seq[Ev]): Seq[Out] = {
    var s = m.init
    evs.flatMap { e => val (s1, out) = m.step(s, e); s = s1; out }
  }

  private def sample(topic: Int, ts: Long, v: Double) =
    Ev(topic, ts, v, null, paused = false)

  test("mixer: startup barrier — nothing emits until every unpaused " +
      "track has produced (the `not started` guard)") {
    val m = new AudioMixer(2)
    assert(run(m, Seq(sample(0, 0, 5), sample(0, 1, 6))).isEmpty)
    val out = run(m, Seq(
      sample(0, 0, 5), sample(0, 1, 6), // track 1 silent: all buffered
      sample(1, 0, 10)))                // barrier lifts → tick 0 releases
    assert(out == Seq(Out(0, 15.0, null)))
  }

  test("mixer: aligned sum on the shared clock; a later head gap-fills " +
      "zero and keeps its sample") {
    val m = new AudioMixer(2)
    val out = run(m, Seq(
      sample(0, 0, 1), sample(1, 0, 10),   // tick 0: 11
      sample(0, 1, 2), sample(1, 2, 20),   // track 1 skips tick 1
      sample(0, 2, 3),                     // tick 1: 2 (gap-fill), tick 2: 23
      sample(0, 3, 4)))                    // tick 3 blocked: track 1 dry
    assert(out == Seq(Out(0, 11.0, null), Out(1, 2.0, null),
      Out(2, 23.0, null)))
  }

  test("mixer: a paused track leaves the min computation but its " +
      "buffered tail keeps mixing (pop over started tracks, " +
      "audiomixer.py:109-114); soft reset clears it once drained; the " +
      "unpause transition hard-resets (audiomixer.py:85-86,118)") {
    val m = new AudioMixer(2)
    val out = run(m, Seq(
      sample(0, 0, 1), sample(1, 0, 10),
      Ev(1, 1, 1.0, null, paused = true), // track 1 pauses (buffer KEPT)
      sample(0, 1, 2), sample(0, 2, 3)))  // track 0 alone drives ticks
    assert(out == Seq(Out(0, 11.0, null), Out(1, 2.0, null),
      Out(2, 3.0, null)))
    // pause with samples still buffered: the tail drains into the mix
    val m1 = new AudioMixer(2)
    val out1 = run(m1, Seq(
      sample(0, 0, 1), sample(1, 0, 10), sample(1, 1, 20),
      Ev(1, 2, 1.0, null, paused = true), // 20@1 stays buffered
      sample(0, 1, 2),                    // target 1: 2 + the paused 20
      sample(0, 2, 3)))                   // tail drained → track 0 alone
    assert(out1 == Seq(Out(0, 11.0, null), Out(1, 22.0, null),
      Out(2, 3.0, null)))
    // a gap on the unpaused track is the zero the reference's
    // sequencer inserted at insert time — it still drives a round, so
    // the paused tail's aligned sample mixes with silence (tick 1 =
    // 0 + 20); nothing is skipped while buffered span remains
    val m3 = new AudioMixer(2)
    val out3 = run(m3, Seq(
      sample(0, 0, 1), sample(1, 0, 10), sample(1, 1, 20),
      Ev(1, 2, 1.0, null, paused = true),
      sample(0, 2, 3)))
    assert(out3 == Seq(Out(0, 11.0, null), Out(1, 20.0, null),
      Out(2, 3.0, null)))
    // resume: hard reset means NOT started — the barrier re-arms
    val m2 = new AudioMixer(2)
    val out2 = run(m2, Seq(
      sample(0, 0, 1), sample(1, 0, 10),
      Ev(1, 1, 1.0, null, paused = true),
      Ev(1, 2, 0.0, null, paused = true), // resume: hard reset, not started
      sample(0, 1, 2)))                   // blocked again on track 1
    assert(out2 == Seq(Out(0, 11.0, null)))
  }

  test("adpcm encoder/decoder: the machine chain reproduces " +
      "Codec.ImaAdpcm's block coder sample-exactly") {
    import graft.functions.Codec.ImaAdpcm
    val xs = Array(0, 100, -250, 3000, 2990, -32000, 12345, 0, 7, -7)
    val enc = new AdpcmEncoder
    val nibbles = run(enc, xs.zipWithIndex.map { case (x, i) =>
      sample(0, i.toLong, x.toDouble) })
    // reference chain: fold encodeStep with the same initial state
    val expected = xs.foldLeft((Vector.empty[Int], 0, 0)) {
      case ((acc, p, ix), x) =>
        val (nib, p2, ix2) = ImaAdpcm.encodeStep(x, p, ix)
        (acc :+ nib, p2, ix2)
    }._1
    assert(nibbles.map(_.value.toInt) == expected)
    val dec = new AdpcmDecoder
    val decoded = run(dec, nibbles.zipWithIndex.map { case (o, i) =>
      sample(0, i.toLong, o.value) })
    val expDec = expected.foldLeft((Vector.empty[Int], 0, 0)) {
      case ((acc, p, ix), nib) =>
        val (x, p2, ix2) = ImaAdpcm.decodeStep(nib, p, ix)
        (acc :+ x, p2, ix2)
    }._1
    assert(decoded.map(_.value.toInt) == expDec)
  }

  test("adpcm: a pause resets the predictor chain (new segment decodes " +
      "from scratch)") {
    import graft.functions.Codec.ImaAdpcm
    val (_, p1, ix1) = ImaAdpcm.encodeStep(3000, 0, 0)
    // find a follow-up sample whose nibble depends on the carried state
    val x2 = (-5000 to 5000 by 50).find { x =>
      ImaAdpcm.encodeStep(x, p1, ix1)._1 != ImaAdpcm.encodeStep(x, 0, 0)._1
    }.get
    val adapted = ImaAdpcm.encodeStep(x2, p1, ix1)._1
    val fresh = ImaAdpcm.encodeStep(x2, 0, 0)._1
    val enc = new AdpcmEncoder
    val a = run(enc, Seq(sample(0, 0, 3000), sample(0, 1, x2.toDouble)))
    assert(a.last.value.toInt == adapted)
    val enc2 = new AdpcmEncoder
    val b = run(enc2, Seq(sample(0, 0, 3000),
      Ev(0, 1, 1.0, null, paused = true), sample(0, 2, x2.toDouble)))
    assert(b.last.value.toInt == fresh) // post-pause: scratch state
  }

  test("resampler: decimation keeps every k-th sample at its own " +
      "timestamp; repetition emits r holds on the out-rate grid") {
    val down = new Resampler(1000, 250)
    val out = run(down, (0 until 10).map(i => sample(0, i.toLong, i * 1.0)))
    assert(out.map(_.ts) == Seq(0L, 4L, 8L))
    val up = new Resampler(250, 1000) // 1000/outRate = 1 ms step... 1000%1000==0
    val out2 = run(up, Seq(sample(0, 0, 7), sample(0, 4, 9)))
    assert(out2.map(o => (o.ts, o.value)) == Seq(
      (0L, 7.0), (1L, 7.0), (2L, 7.0), (3L, 7.0),
      (4L, 9.0), (5L, 9.0), (6L, 9.0), (7L, 9.0)))
  }

  test("resampler: irrational ratios are rejected at build time") {
    val e = intercept[IllegalArgumentException](new Resampler(44100, 32000))
    assert(e.getMessage.contains("rational"))
  }

  test("loader: audio kinds load from the reference's config names and " +
      "round-trip write -> load -> write as a fixpoint") {
    import graft.plans.{DeploymentJson, Pipeline}
    import graft.plans.Pipeline._
    val dep = Deployment("audio", Seq(
      TaskSpec("in_a", SourceOp(IOMeta(IOMeta.audio.fields +
        ("codec" -> "pcm_mulaw"))), Nil, "coded_a"),
      TaskSpec("in_b", SourceOp(IOMeta.audio), Nil, "raw_b"),
      TaskSpec("dec", AudioDecoderOp("pcm_mulaw"), Seq("coded_a"), "raw_a"),
      TaskSpec("mix", AudioMixerOp(2), Seq("raw_a", "raw_b"), "mixed"),
      TaskSpec("rs", AudioResamplerOp(1000, 250), Seq("mixed"), "slow"),
      TaskSpec("enc", AudioEncoderOp("adpcm_ima"), Seq("slow"), "packets"),
      TaskSpec("out", NamedOutputOp("packets",
        IOMeta(Map("type" -> "ts", "content" -> "audio",
          "codec" -> "adpcm_ima"))), Seq("packets"), Nil)))
    assert(Pipeline.validate(dep).isEmpty)
    val json = DeploymentJson.write(dep)
    val loaded = DeploymentJson.load(json)
    assert(DeploymentJson.write(loaded.deployment) == json)
    val ops = loaded.deployment.tasks.map(t => t.name -> t.op).toMap
    assert(ops("dec") == AudioDecoderOp("pcm_mulaw"))
    assert(ops("mix") == AudioMixerOp(2))
    assert(ops("rs") == AudioResamplerOp(1000, 250))
    assert(ops("enc") == AudioEncoderOp("adpcm_ima"))
    assert(Pipeline.validate(loaded.deployment).isEmpty)
  }

  test("wiring type-check: a mu-law coded stream refuses to connect to " +
      "a raw-audio consumer") {
    import graft.plans.Pipeline
    import graft.plans.Pipeline._
    val dep = Deployment("bad", Seq(
      TaskSpec("in_a", SourceOp(IOMeta(IOMeta.audio.fields +
        ("codec" -> "pcm_mulaw"))), Nil, "coded"),
      TaskSpec("meter", AudioVolumeMeterOp(1000, 125), Seq("coded"), "vol")))
    val errs = Pipeline.validate(dep)
    assert(errs.exists(_.contains("codec")))
  }
}

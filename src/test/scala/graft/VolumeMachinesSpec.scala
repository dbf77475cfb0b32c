package graft

import graft.streaming.StateMachines._
import org.scalatest.funsuite.AnyFunSuite

/** Pure-machine unit tests for the media volume family (the c10
  * deployment's operators): the scaler's numpy clip/astype semantics
  * and default-reset rules (audiovolumescaler.py:68-97) and the
  * meter's AudioChunker release/timestamp rules
  * (audiovolumemeter.py:61-74 + media/util.py:131-148).
  */
class VolumeMachinesSpec extends AnyFunSuite {

  private def run[S](m: Machine[S], evs: Seq[Ev]): Seq[Out] = {
    var s = m.init
    evs.flatMap { e => val (s1, out) = m.step(s, e); s = s1; out }
  }

  private def data(ts: Long, v: Double) = Ev(0, ts, v, null, paused = false)
  private def scale(ts: Long, v: Double) = Ev(1, ts, v, null, paused = false)

  test("scaler: last scale value applies, clips to the dtype range and " +
      "truncates toward zero like numpy astype (audiovolumescaler.py:78)") {
    val m = new VolumeScaler(1.0, -32768, 32767)
    val out = run(m, Seq(
      data(0, 101),          // default scale 1.0 → 101
      scale(1, 0.5),
      data(2, 101),          // 50.5 → truncates to 50 (not rounds)
      data(3, -101),         // -50.5 → -50 (toward zero, not floor)
      scale(4, 2.0),
      data(5, 30000),        // 60000 → clip 32767
      data(6, -30000)))      // -60000 → clip -32768
    assert(out.map(_.value) == Seq(101.0, 50.0, -50.0, 32767.0, -32768.0))
    assert(out.map(_.ts) == Seq(0L, 2L, 3L, 5L, 6L))
  }

  test("scaler: control pause and invalid (NaN) scale reset to the " +
      "default; unpause does not (audiovolumescaler.py:82-90)") {
    val m = new VolumeScaler(1.0, -32768, 32767)
    val out = run(m, Seq(
      scale(0, 3.0),
      data(1, 10),                               // ×3 = 30
      Ev(1, 2, 1.0, null, paused = true),        // control pauses → default
      data(3, 10),                               // ×1 = 10
      Ev(1, 4, 0.0, null, paused = true),        // control unpause: no reset
      scale(5, 2.0),
      data(6, 10),                               // ×2 = 20
      scale(7, Double.NaN),                      // invalid → default
      data(8, 10)))                              // ×1 = 10
    assert(out.map(_.value) == Seq(30.0, 10.0, 20.0, 10.0))
  }

  test("scaler: input pause forwards as an output transition marker; " +
      "data rows never emit while nothing changes the flag twice") {
    val m = new VolumeScaler(1.0, -32768, 32767)
    val out = run(m, Seq(
      data(0, 5),
      Ev(0, 1, 1.0, null, paused = true),   // pause → marker
      Ev(0, 2, 1.0, null, paused = true),   // repeat → no duplicate marker
      Ev(0, 3, 0.0, null, paused = true),   // resume → marker
      data(4, 6)))
    assert(out == Seq(
      Out(0, 5.0, null),
      Out(1, 1.0, null, paused = true),
      Out(3, 0.0, null, paused = true),
      Out(4, 6.0, null)))
  }

  test("meter: a block releases only when the buffer EXCEEDS chunk_size " +
      "(util.py:145 `while size > chunk_size`) — an exactly-full block " +
      "with no successor never emits") {
    val m = new VolumeMeter(4, 1000, 100.0)
    // 4 samples fill the chunk but do NOT release it
    assert(run(m, (0 until 4).map(i => data(i, 10))).isEmpty)
    // the 5th sample releases the first 4 (|10|·4 / 100 / 4 = 0.1)
    val out = run(m, (0 until 5).map(i => data(i, 10)))
    assert(out == Seq(Out(0, math.sqrt(0.1), null)))
  }

  test("meter: block timestamp is msg.ts − size_before·1000 // rate " +
      "(util.py:142) with integer floor at a non-divisible rate") {
    // rate 3 Hz: 4 buffered samples → back-projection 4·1000/3 = 1333 ms
    val m = new VolumeMeter(4, 3, 1.0)
    val ts = Seq(0L, 400L, 800L, 1200L, 1600L)
    val out = run(m, ts.map(t => data(t, 1.0)))
    assert(out.map(_.ts) == Seq(1600L - 4 * 1000 / 3))
  }

  test("meter: the released block excludes the triggering sample, which " +
      "seeds the next block; values are sqrt(mean(|x|/max))") {
    val m = new VolumeMeter(2, 1000, 10.0)
    val out = run(m, Seq(
      data(0, 2), data(1, 4),  // block 1 content
      data(2, 8),              // releases block 1, starts block 2
      data(3, 6),
      data(4, 2)))             // releases block 2 = (8, 6)
    // expected = the machine's exact float order: sqrt(Σ|x| / max / n)
    assert(out.map(_.value) == Seq(
      math.sqrt(6.0 / 10.0 / 2),
      math.sqrt(14.0 / 10.0 / 2)))
    assert(out.map(_.ts) == Seq(0L, 2L))
  }

  test("meter: pause emits a zero volume at the marker's event time and " +
      "forwards the transition (audiovolumemeter.py:53-55)") {
    val m = new VolumeMeter(4, 1000, 1.0)
    val out = run(m, Seq(
      data(0, 1.0),
      Ev(0, 5, 1.0, null, paused = true),
      Ev(0, 9, 0.0, null, paused = true)))
    assert(out == Seq(
      Out(5, 0.0, null),
      Out(5, 1.0, null, paused = true),
      Out(9, 0.0, null, paused = true)))
  }

  test("loader: inputcontainer expands to one bindable source per track " +
      "published as <source>#<kind><idx> (inputcontainer.py:62-98)") {
    import graft.plans.{DeploymentJson, Pipeline}
    val json =
      """[{"id": "x", "deployment_id": "y", "task_host_id": "inputcontainer",
        |  "label": "cam", "config": {
        |    "source": "rtmp://host/live", "real_time": true,
        |    "video_tracks": [{"out_topic": 1}, {"out_topic": 2}],
        |    "audio_tracks": [{"out_topic": 3}]},
        |  "frontend_config": {}, "inputs": [], "outputs": []}]""".stripMargin
    val loaded = DeploymentJson.load(json)
    assert(loaded.namedInputs == Map(
      "rtmp://host/live#video0" -> "t1",
      "rtmp://host/live#video1" -> "t2",
      "rtmp://host/live#audio0" -> "t3"))
    val ops = loaded.deployment.tasks.map(t => t.name -> t.op).toMap
    assert(ops.keySet == Set("cam_video0", "cam_video1", "cam_audio0"))
    assert(ops("cam_audio0") == Pipeline.SourceOp(Pipeline.IOMeta.audio))
  }

  test("loader: audiovolumescaler without a scale_topic is the fixed-" +
      "gain variant; sample_format picks the clip range") {
    import graft.plans.{DeploymentJson, Pipeline}
    val json =
      """[{"id": "x", "deployment_id": "y",
        |  "task_host_id": "audiovolumescaler", "label": "vs",
        |  "config": {"sample_format": "flt", "default_scale": 0.25,
        |    "in_topic": 1, "out_topic": 2},
        |  "frontend_config": {}, "inputs": [], "outputs": []}]""".stripMargin
    val loaded = DeploymentJson.load(json)
    val op = loaded.deployment.tasks.find(_.name == "vs").get.op
    assert(op == Pipeline.AudioVolumeScalerOp(0.25, hasControl = false,
      lo = -1.0, hi = 1.0))
  }
}

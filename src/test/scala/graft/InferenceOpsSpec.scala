package graft

import graft.streaming.StateMachines._
import org.scalatest.funsuite.AnyFunSuite

/** The §2.4 inference family as deployment ops: the chunked ASR
  * machine against the jar-shipped trained head
  * (asrspeechrecognition.py:54-71), the TTS length-regulator synth
  * (fastspeech2tts.py:56-77 / m08), loader round-trips — and the
  * catalog-completeness pin: every in-scope reference task kind
  * (SURVEY §2 minus device IO #31-32 and UI #39-44/46) resolves in
  * DeploymentJson, so any exported deployment of in-scope tasks
  * loads.
  */
class InferenceOpsSpec extends AnyFunSuite {

  private def run[S](m: Machine[S], evs: Seq[Ev]): Seq[Out] = {
    var s = m.init
    evs.flatMap { e => val (s1, out) = m.step(s, e); s = s1; out }
  }

  test("asr machine: chunks of dim samples run the trained head; the " +
      "CTC collapse drops repeats and blanks") {
    val m = graft.functions.AsrTiny.model
    // clean class-template frames decode to their classes
    def frame(cls: Int): Seq[Double] = m.tmpl(cls).map(_.toDouble).toSeq
    val asr = new AsrChunked(m.dim)
    val stream = (frame(2) ++ frame(2) ++ frame(0) ++ frame(3)).zipWithIndex
      .map { case (v, i) => Ev(0, i.toLong, v, null, paused = false) }
    val out = run(asr, stream)
    // repeat of 2 collapsed, blank 0 dropped → symbols 2, 3
    assert(out.map(_.value) == Seq(2.0, 3.0))
    assert(out.map(_.text) == Seq("2", "3"))
    // emission timestamps: the chunk-completing sample's ts
    assert(out.map(_.ts) == Seq(m.dim - 1L, 4L * m.dim - 1))
  }

  test("asr machine: a pause resets the utterance — the same symbol " +
      "re-emits after the break") {
    val m = graft.functions.AsrTiny.model
    val asr = new AsrChunked(m.dim)
    def evs(base: Long) = m.tmpl(2).zipWithIndex.map { case (v, i) =>
      Ev(0, base + i, v.toDouble, null, paused = false) }.toSeq
    val out = run(asr, evs(0) ++ Seq(Ev(0, 100, 1.0, null, paused = true)) ++
      evs(200))
    assert(out.filterNot(_.paused).map(_.value) == Seq(2.0, 2.0))
  }

  test("tts synth: each char expands to samplesPerChar envelope samples " +
      "on a 1 ms grid — amp(c)·tri(j)") {
    val tts = new TtsSynth(8)
    val out = run(tts, Seq(Ev(0, 1000, Double.NaN, "41", paused = false)))
    assert(out.size == 16)
    assert(out.map(_.ts) == (1000L until 1016L))
    // '4' = 52 → amp 5; '1' = 49 → amp 2; tri = 0,1,2,3,4,3,2,1
    val tri = Seq(0, 1, 2, 3, 4, 3, 2, 1)
    assert(out.take(8).map(_.value) == tri.map(_ * 5.0))
    assert(out.drop(8).map(_.value) == tri.map(_ * 2.0))
  }

  test("loader: inference kinds round-trip; waveform and sme " +
      "enhancement both load as the gate kernel") {
    import graft.plans.{DeploymentJson, Pipeline}
    import graft.plans.Pipeline._
    val dep = Deployment("inf", Seq(
      TaskSpec("mic", SourceOp(IOMeta.audio), Nil, "pcm"),
      TaskSpec("prompt", SourceOp(IOMeta.text), Nil, "words"),
      TaskSpec("asr", AsrOp(8), Seq("pcm"), "heard"),
      TaskSpec("tts", TtsOp(12), Seq("words"), "speech"),
      TaskSpec("clean", SpeechEnhanceOp(25.0), Seq("speech"), "cleaned"),
      TaskSpec("out", NamedOutputOp("heard", IOMeta.text), Seq("heard"), Nil)))
    assert(Pipeline.validate(dep).isEmpty)
    val json = DeploymentJson.write(dep)
    val loaded = DeploymentJson.load(json)
    assert(DeploymentJson.write(loaded.deployment) == json)
    val ops = loaded.deployment.tasks.map(t => t.name -> t.op).toMap
    assert(ops("asr") == AsrOp(8))
    assert(ops("tts") == TtsOp(12))
    assert(ops("clean") == SpeechEnhanceOp(25.0))
    // the waveform variant maps onto the same kernel
    val wf = DeploymentJson.load(
      """[{"id": "x", "deployment_id": "y",
        |  "task_host_id": "waveformspeechenhancement", "label": "w",
        |  "config": {"threshold": 9, "in_topic": 1, "out_topic": 2},
        |  "frontend_config": {}, "inputs": [], "outputs": []}]""".stripMargin)
    assert(wf.deployment.tasks.find(_.name == "w").get.op ==
      SpeechEnhanceOp(9.0))
  }

  test("catalog completeness: every in-scope reference task kind " +
      "resolves in the loader — an exported deployment of in-scope " +
      "tasks always loads") {
    import graft.plans.DeploymentJson
    // streamtasks/system/tasks/**: every module that defines a
    // TaskHost, minus device IO (audioinput/audiooutput/videoinput/
    // screencapture — SURVEY #31-32) and the ui/ widgets (#39-44, #46)
    val inScope = Set(
      // core (tasks/*.py)
      "calculator", "gate", "messagedetector", "namedinput", "namedoutput",
      "numbertotext", "pulsegenerator", "repeater", "replaybuffer",
      "srlatch", "stringconcatenator", "stringmatcher", "switch",
      "synchronizer", "textformatter", "timebuffer", "timestampupdater",
      "timetotext",
      // media (tasks/media/*.py minus device IO)
      "audiodecoder", "audioencoder", "audiomixer", "audioresampler",
      "audiovolumemeter", "audiovolumescaler", "imagerenderer",
      "inputcontainer", "mediaswitch", "outputcontainer", "textrenderer",
      "videoactivitymeter", "videodecoder", "videoencoder", "videolayout",
      "videomixer", "videoreformatter",
      // inference (tasks/inference/*.py)
      "asrspeechrecognition", "fastspeech2tts", "llamacppchat",
      "smespeechenhancement", "waveformspeechenhancement")
    assert(inScope.size == 40)
    val missing = inScope.diff(DeploymentJson.hostClasses.keySet)
    assert(missing.isEmpty, s"loader missing kinds: $missing")
  }
}

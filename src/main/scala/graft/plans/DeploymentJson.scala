package graft.plans

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Loader/writer for the reference's STORED-DEPLOYMENT artifact — the
  * JSON a streamtasks user actually has on disk: a deployment header
  * plus a list of StoredTasks (`task_web.py:32-58` — id, deployment_id,
  * task_host_id, label, config, frontend_config, inputs, outputs). A
  * user with an exported deployment loads it here and gets a
  * [[Pipeline.Deployment]] that compiles onto the batch or streaming
  * engine unchanged — no re-authoring in the Scala DSL.
  *
  * Conventions mirrored from the reference:
  *  - `task_host_id` identifies the operator KIND: it is
  *    `sha256("TaskHost" + <TaskHost class name> + <node name>)[:16]`
  *    (`task.py:153` + `utils.py:293-297`). [[load]] resolves it via
  *    (a) an explicit `hosts` override, (b) the plain kind name
  *    (loader-friendly exports), or (c) recomputing the hash for every
  *    known TaskHost class under the caller's `nodeName`.
  *  - WIRING lives in `config` (the task only ever sees its config —
  *    `create_task` calls `XConfig.model_validate(config)`, e.g.
  *    `gate.py:60`): topic ids under the documented keys (`in_topic`,
  *    `control_topic`, `variable_tracks[].in_topic`,
  *    `pairs[].input/control`, synchronizer `topics` pairs). Topic id
  *    N becomes stream name `tN`.
  *  - Topics consumed but never produced are external feeds: a
  *    [[Pipeline.SourceOp]] task is synthesized per such topic (its
  *    IOMeta taken from the consumer op's declared input meta), so the
  *    loaded deployment validates; callers bind DataFrames to those
  *    streams at [[Pipeline.compile]] time.
  *
  * [[write]] emits the same shape (kind names as task_host_id, so the
  * output is loadable anywhere without a node name); PipelineSpec pins
  * the spec→JSON→spec round-trip as a JSON fixpoint.
  */
object DeploymentJson {
  import Pipeline._

  /** `sha256("TaskHost" + className + nodeName)` hex, first 16 chars —
    * exactly `get_node_name_id("TaskHost" + name)` (utils.py:293-297). */
  def taskHostId(className: String, nodeName: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(s"TaskHost$className".getBytes("UTF-8"))
    md.update(nodeName.getBytes("UTF-8"))
    md.digest().map(b => f"$b%02x").mkString.substring(0, 16)
  }

  /** Operator kind → reference TaskHost class name (for hash-id
    * resolution). */
  val hostClasses: Map[String, String] = Map(
    "namedinput" -> "NamedInputTaskHost",
    "namedoutput" -> "NamedOutputTaskHost",
    "gate" -> "GateTaskHost",
    "calculator" -> "CalculatorTaskHost",
    "switch" -> "SwitchTaskHost",
    "mediaswitch" -> "MediaSwitchTaskHost",
    "srlatch" -> "SRLatchTaskHost",
    "stringmatcher" -> "StringMatcherTaskHost",
    "numbertotext" -> "NumberToTextTaskHost",
    "timestampupdater" -> "TimestampUpdaterTaskHost",
    "timetotext" -> "TimeToTextTaskHost",
    "textformatter" -> "TextFormatterTaskHost",
    "stringconcatenator" -> "StringConcatenatorTaskHost",
    "messagedetector" -> "MessageDetectorTaskHost",
    "timebuffer" -> "TimeBufferTaskHost",
    "repeater" -> "RepeaterTaskHost",
    "synchronizer" -> "SynchronizerTaskHost",
    "replaybuffer" -> "ReplayBufferTaskHost",
    "llamacppchat" -> "LLamaCppChatTaskHost",
    "outputcontainer" -> "OutputContainerTaskHost",
    "pulsegenerator" -> "PulseGeneratorTaskHost",
    "audiovolumescaler" -> "AudioVolumeScalerTaskHost",
    "audiovolumemeter" -> "AudioVolumeMeterTaskHost",
    "inputcontainer" -> "InputContainerTaskHost",
    "videoreformatter" -> "VideoReformatterTaskHost",
    "videolayout" -> "VideoLayoutTaskHost",
    "videoactivitymeter" -> "VideoActivityMeterTaskHost",
    "videomixer" -> "VideoMixerTaskHost",
    "videoencoder" -> "VideoEncoderTaskHost",
    "videodecoder" -> "VideoDecoderTaskHost",
    "textrenderer" -> "TextRendererTaskHost",
    "imagerenderer" -> "ImageRendererTaskHost",
    "asrspeechrecognition" -> "ASRSpeechRecognitionTaskHost",
    "fastspeech2tts" -> "FastSpeech2TTSTaskHost",
    "smespeechenhancement" -> "SMESpeechEnhancementTaskHost",
    "waveformspeechenhancement" -> "WaveformSpeechEnhancementTaskHost",
    "audiomixer" -> "AudioMixerTaskHost",
    "audioencoder" -> "AudioEncoderTaskHost",
    "audiodecoder" -> "AudioDecoderTaskHost",
    "audioresampler" -> "AudioResamplerTaskHost")

  /** A loaded deployment plus its published IO names: `namedInputs`
    * maps each named-input's `name` to the stream to bind a source
    * DataFrame to; `namedOutputs` maps each named-output's `name` to
    * the stream to read results from (namedinput.py / namedoutput.py —
    * SURVEY §2.1 #18). Synthesized external topics appear in
    * `namedInputs` under their `tN` stream name. */
  final case class Loaded(deployment: Deployment,
      namedInputs: Map[String, String], namedOutputs: Map[String, String])

  // --------------------------------------------------------------- loading

  private def jStr(v: JValue, field: String, ctx: String): String = v \ field match {
    case JString(s) => s
    case JNothing => sys.error(s"$ctx: missing '$field'")
    case other => sys.error(s"$ctx: '$field' is ${other.getClass.getSimpleName}, expected string")
  }

  private def optLong(v: JValue): Option[Long] = v match {
    case JInt(n) => Some(n.toLong)
    case JLong(n) => Some(n)
    case JDouble(d) if d.isWhole => Some(d.toLong)
    case JDecimal(d) if d.isWhole => Some(d.toLong)
    case _ => None
  }

  private def cfgTopic(cfg: JValue, key: String, ctx: String): Long =
    optLong(cfg \ key).getOrElse(
      sys.error(s"$ctx: config key '$key' missing or not a topic id"))

  private def cfgDouble(cfg: JValue, key: String, default: Double): Double =
    cfg \ key match {
      case JInt(n) => n.toDouble
      case JLong(n) => n.toDouble
      case JDouble(d) => d
      case JDecimal(d) => d.toDouble
      case _ => default
    }

  private def cfgString(cfg: JValue, key: String, default: String): String =
    cfg \ key match { case JString(s) => s; case _ => default }

  private def cfgBool(cfg: JValue, key: String, default: Boolean): Boolean =
    cfg \ key match { case JBool(b) => b; case _ => default }

  private def stream(id: Long): String = s"t$id"

  /** Parse a stored-deployment JSON into a validated-shape
    * [[Loaded]]. Accepts `{"deployment": {...}, "tasks": [...]}` or a
    * bare task array. `nodeName` enables hash-id resolution for real
    * exports; `hosts` overrides individual ids. */
  def load(json: String, nodeName: Option[String] = None,
      hosts: Map[String, String] = Map.empty): Loaded = {
    val root = JsonMethods.parse(json)
    val (depLabel, taskArr) = root match {
      case JArray(ts) => ("deployment", ts)
      case obj: JObject =>
        val label = obj \ "deployment" \ "label" match {
          case JString(s) => s
          case _ => "deployment"
        }
        obj \ "tasks" match {
          case JArray(ts) => (label, ts)
          case _ => sys.error("deployment JSON: no 'tasks' array")
        }
      case _ => sys.error("deployment JSON: expected object or array")
    }
    val byHash: Map[String, String] = nodeName match {
      case Some(nn) => hostClasses.map { case (kind, cls) =>
        taskHostId(cls, nn) -> kind }
      case None => Map.empty
    }
    def kindOf(hostId: String, ctx: String): String =
      hosts.get(hostId)
        .orElse(if (hostClasses.contains(hostId)) Some(hostId) else None)
        .orElse(byHash.get(hostId))
        .getOrElse(sys.error(s"$ctx: unknown task_host_id '$hostId' — " +
          "pass nodeName= for hash resolution or a hosts= override"))

    // insertion-ordered + COLLISION-CHECKED: two tasks publishing the
    // same name (two inputcontainers on one source, duplicate
    // namedinput names) would otherwise silently last-win, leaving the
    // loser's SourceOp stream unbound with no error naming the cause
    val namedIn = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val namedOut = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def addIn(key: String, v: String, ctx: String): Unit = {
      require(!namedIn.contains(key),
        s"$ctx: named input '$key' is already published by another task")
      namedIn(key) = v
    }
    def addOut(key: String, v: String, ctx: String): Unit = {
      require(!namedOut.contains(key),
        s"$ctx: named output '$key' is already published by another task")
      namedOut(key) = v
    }
    val seen = scala.collection.mutable.Set.empty[String]
    val tasks = taskArr.flatMap { tj =>
      val label = jStr(tj, "label", "task")
      val ctx = s"task '$label'"
      // state keys are dep/name — duplicate labels must not collide
      val name = if (seen.add(label)) label else {
        var i = 2
        while (!seen.add(s"${label}_$i")) i += 1
        s"${label}_$i"
      }
      val cfg = tj \ "config"
      val kind = kindOf(jStr(tj, "task_host_id", ctx), ctx)
      def in(key: String) = stream(cfgTopic(cfg, key, ctx))
      def out(key: String) = stream(cfgTopic(cfg, key, ctx))
      if (kind == "inputcontainer") {
        // InputContainerConfig (inputcontainer.py:48-60): a `source`
        // URL/path demuxed into one out topic per configured track.
        // The demux itself is the media layer's job (the engine's
        // container demuxers — Wav/Avi/Matroska/IsoBmff/MpegTs — or a
        // live URL reader at the edge); the LOADED deployment declares
        // each track as a bindable source, published as
        // `<source>#<kind><idx>` so the binder knows which demuxed
        // track to feed (mirroring _run_stream's per-track out topics,
        // inputcontainer.py:62-98). One loaded task expands to one
        // SourceOp per track — the multi-output task as independent
        // single-output sources.
        val src = cfgString(cfg, "source", "")
        def trackTasks(key: String, kindLbl: String, meta: IOMeta)
            : Seq[TaskSpec] = cfg \ key match {
          case JArray(ts) => ts.zipWithIndex.map { case (t, i) =>
            val s0 = stream(cfgTopic(t, "out_topic", ctx))
            addIn(s"$src#$kindLbl$i", s0, ctx)
            val nm = s"${name}_$kindLbl$i"
            require(seen.add(nm), s"$ctx: track task name '$nm' collides")
            // the track's declared codec AND rate flow into the IO
            // metadata so a coded track wires to the matching decoder
            // and rate-aware consumers/binders (RunDeployment's .flv
            // capture binding) can read the sample clock — the
            // reference's config_to_output_map convention
            // (inputcontainer.py:48-60 carries rate per track).
            // compatibleWith only checks intersecting keys, so
            // rate-less consumer metas are unaffected.
            val codec = cfgString(t, "codec", "raw")
            val extra = optLong(t \ "rate").map { r =>
              require(r >= 1, s"$ctx: track rate $r must be >= 1")
              Map("rate" -> r.toString)
            }.getOrElse(Map.empty[String, String])
            TaskSpec(nm,
              SourceOp(IOMeta(meta.fields + ("codec" -> codec) ++ extra)),
              Nil, s0)
          }
          case _ => Nil
        }
        val tracks =
          trackTasks("video_tracks", "video", IOMeta.video) ++
          trackTasks("audio_tracks", "audio", IOMeta.audio)
        require(tracks.nonEmpty, s"$ctx: input container needs tracks")
        tracks
      } else Seq(kind match {
        case "namedinput" =>
          val meta = tj \ "outputs" match {
            case JArray(o :: _) => ioMeta(o)
            case _ => IOMeta(Map("type" -> "ts"))
          }
          val s = out("out_topic")
          addIn(cfgString(cfg, "name", name), s, ctx)
          TaskSpec(name, SourceOp(meta), Nil, s)
        case "namedoutput" =>
          val meta = tj \ "inputs" match {
            case JArray(i :: _) => ioMeta(i)
            case _ => IOMeta(Map("type" -> "ts"))
          }
          val s = in("in_topic")
          addOut(cfgString(cfg, "name", name), s, ctx)
          TaskSpec(name, NamedOutputOp(cfgString(cfg, "name", name), meta),
            Seq(s), Nil)
        case "gate" =>
          // GateFailMode default is OPEN (gate.py:15-20)
          val failOpen = cfgString(cfg, "fail_mode", "open") == "open"
          require(!cfgBool(cfg, "initial_control", default = false),
            s"$ctx: initial_control=true is unsupported (gate starts closed)")
          TaskSpec(name, GateOp(failOpen),
            Seq(in("in_topic"), in("control_topic")), out("out_topic"))
        case "calculator" =>
          val tracks = cfg \ "variable_tracks" match {
            case JArray(ts) => ts
            case _ => Nil
          }
          val vars = tracks.map(t => jStr(t, "name", s"$ctx track"))
          val defaults = tracks.flatMap { t =>
            val n = jStr(t, "name", ctx)
            val d = cfgDouble(t, "default_value", 0.0)
            if (d != 0.0) Some(n -> d) else None
          }.toMap
          val ins = tracks.map(t => stream(cfgTopic(t, "in_topic", ctx)))
          TaskSpec(name,
            CalculatorOp(cfgString(cfg, "formula", "1"), vars, defaults),
            ins, out("out_topic"))
        case "switch" | "mediaswitch" =>
          val pairs = cfg \ "pairs" match {
            case JArray(ps) => ps
            case _ => Nil
          }
          // machine input order: (data0, ctrl0, data1, ctrl1, …)
          val ins = pairs.flatMap(p => Seq(
            stream(cfgTopic(p, "input", ctx)),
            stream(cfgTopic(p, "control", ctx))))
          val op = if (kind == "switch") SwitchOp(pairs.size)
            else MediaSwitchOp(pairs.size)
          TaskSpec(name, op, ins, out("output"))
        case "srlatch" =>
          TaskSpec(name, SrLatchOp,
            Seq(in("set_topic"), in("reset_topic")), out("out_topic"))
        case "stringmatcher" =>
          val raw = cfgString(cfg, "pattern", "")
          val isRegex = cfgBool(cfg, "is_regex", default = false)
          val flags = cfgString(cfg, "flags", "")
            .filter("ims".contains(_))
          val pat = (if (flags.nonEmpty) s"(?$flags)" else "") +
            (if (isRegex) raw else java.util.regex.Pattern.quote(raw))
          TaskSpec(name, StringMatcherOp(pat),
            Seq(in("in_topic")), out("out_topic"))
        case "numbertotext" =>
          TaskSpec(name, NumberToTextOp, Seq(in("in_topic")), out("out_topic"))
        case "timestampupdater" =>
          TaskSpec(name,
            TimestampUpdaterOp(cfgDouble(cfg, "time_offset", 0.0).toLong),
            Seq(in("in_topic")), out("out_topic"))
        case "timetotext" =>
          TaskSpec(name,
            TimeToTextOp(cfgString(cfg, "date_format", "%d/%m/%Y, %H:%M:%S")),
            Seq(in("in_topic")), out("out_topic"))
        case "textformatter" =>
          val tracks = cfg \ "variable_tracks" match {
            case JArray(ts) => ts
            case _ => Nil
          }
          val vars = tracks.map(t => jStr(t, "name", ctx))
          val ins = tracks.map(t => stream(cfgTopic(t, "in_topic", ctx)))
          TaskSpec(name,
            TextFormatterOp(cfgString(cfg, "template", ""), vars),
            ins, out("out_topic"))
        case "stringconcatenator" =>
          TaskSpec(name, StringConcatenatorOp,
            Seq(in("in_topic"), in("control_topic")), out("out_topic"))
        case "messagedetector" =>
          // time_out is SECONDS (messagedetector.py:100); machine takes ms
          val ms = math.round(cfgDouble(cfg, "time_out", 0.0) * 1000.0)
          require(ms > 0, s"$ctx: time_out must be > 0")
          TaskSpec(name, MessageDetectorOp(ms),
            Seq(in("in_topic")), out("signal_topic"))
        case "timebuffer" =>
          TaskSpec(name,
            TimeBufferOp(cfgDouble(cfg, "size", 1000.0).toLong),
            Seq(in("in_topic")), out("out_topic"))
        case "repeater" =>
          // the reference repeater generates its own wall clock at
          // `rate` (repeater.py:36-69); the deterministic engine takes
          // the tick stream as an explicit input — our documented
          // `tick_topic` config extension
          TaskSpec(name, RepeaterOp,
            Seq(in("in_topic"), in("tick_topic")), out("out_topic"))
        case "synchronizer" =>
          val pairs = cfg \ "topics" match {
            case JArray(ps) => ps.map {
              case JArray(List(a, b)) =>
                (optLong(a).getOrElse(sys.error(s"$ctx: bad topic pair")),
                  optLong(b).getOrElse(sys.error(s"$ctx: bad topic pair")))
              case _ => sys.error(s"$ctx: 'topics' entries must be [in, out]")
            }
            case _ => sys.error(s"$ctx: synchronizer needs 'topics' pairs")
          }
          TaskSpec(name, SynchronizerOp(pairs.size),
            pairs.map(p => stream(p._1)), pairs.map(p => stream(p._2)))
        case "replaybuffer" =>
          TaskSpec(name, ReplayBufferOp(cfgBool(cfg, "loop", default = false)),
            Seq(in("in_topic"), in("play_topic")), out("out_topic"))
        case "llamacppchat" =>
          // src_model is a PATH to trained weights exactly as in the
          // reference (llamacppchat.py:16 `src_model`, :49 Llama(
          // model_path=...)); here it names a BigramLm table dir —
          // the engine's trained chat kernel, loaded lazily per
          // executor. max_tokens bounds the greedy decode (reference
          // default 0 = unbounded; the bigram chain is self-limiting,
          // so 0 maps to the kernel's 3-token default).
          val model = cfgString(cfg, "src_model", "")
          require(model.nonEmpty, s"$ctx: src_model path required")
          val maxTok = cfgDouble(cfg, "max_tokens", 0.0).toInt
          val sysMsg = cfgString(cfg, "system_message", "")
          TaskSpec(name,
            ChatOp(Option(sysMsg).filter(_.nonEmpty),
              cfgDouble(cfg, "context_length", 512.0).toInt,
              graft.functions.BigramLm(model,
                if (maxTok > 0) maxTok else 3)),
            Seq(in("in_topic")), out("out_topic"))
        case "pulsegenerator" =>
          // a wall-clock tick source (pulsegenerator.py:12-33) — in
          // the deterministic engine its output is an EXTERNAL feed:
          // the caller binds the tick grid (EventOps.tickGrid is the
          // batch generator; a rate source is the streaming one). The
          // configured interval is surfaced in the published name so
          // the binder knows the cadence.
          val s0 = out("out_topic")
          val iv = cfgDouble(cfg, "interval", 1.0)
          addIn(s"$name@${iv}s", s0, ctx)
          TaskSpec(name, SourceOp(IOMeta(Map("type" -> "ts"))), Nil, s0)
        case "outputcontainer" =>
          // OutputContainerConfig (media/outputcontainer.py:44-49):
          // video_tracks [{rate, in_topic, ...}], audio_tracks
          // [{rate, in_topic, ...}], max_desync (ms). Stream clocks
          // map onto OcStreamCfg: a video packet advances 1 frame at
          // time base 1/rate; an audio packet advances `frame_size`
          // samples (engine extension, default 1024 — the reference
          // takes it from the codec context) at 1/sample_rate. The
          // mux-trace stream rides engine extension `out_topic` (the
          // reference writes to `destination` instead — a non-empty
          // destination is surfaced as a named output).
          def ocTracks(key: String, kind: String, defRate: Double)
              : Seq[(String, graft.streaming.StateMachines.OcStreamCfg)] =
            cfg \ key match {
              case JArray(ts) => ts.zipWithIndex.map { case (t, i) =>
                val rate = cfgDouble(t, "rate", defRate).toLong
                val adv = if (kind == "video") 1L
                  else cfgDouble(t, "frame_size", 1024.0).toLong
                (stream(cfgTopic(t, "in_topic", ctx)),
                  graft.streaming.StateMachines.OcStreamCfg(
                    1L, rate, adv, s"$kind$i"))
              }
              case _ => Nil
            }
          val tracks = ocTracks("video_tracks", "video", 30.0) ++
            ocTracks("audio_tracks", "audio", 32000.0)
          require(tracks.nonEmpty, s"$ctx: output container needs tracks")
          val outStream = optLong(cfg \ "out_topic").map(stream)
            .getOrElse(s"oc_$name")
          val dest = cfgString(cfg, "destination", "")
          if (dest.nonEmpty) addOut(dest, outStream, ctx)
          TaskSpec(name,
            OutputContainerOp(tracks.map(_._2),
              cfgDouble(cfg, "max_desync", 100.0).toLong),
            tracks.map(_._1), outStream)
        case "audiovolumescaler" =>
          // AudioVolumeScalerConfig (audiovolumescaler.py:30-33):
          // in_topic, optional scale_topic, default_scale; dtype range
          // from sample_format (s16 ⇒ ±32767/−32768, flt ⇒ ±1)
          val fmt = cfgString(cfg, "sample_format", "s16")
          val (lo, hi) = fmt match {
            case "s16" => (-32768.0, 32767.0)
            case "s32" => (Int.MinValue.toDouble, Int.MaxValue.toDouble)
            case _ => (-1.0, 1.0) // float formats (get_dtype_min_max)
          }
          val hasCtl = optLong(cfg \ "scale_topic").isDefined
          val ins = Seq(in("in_topic")) ++
            (if (hasCtl) Seq(in("scale_topic")) else Nil)
          TaskSpec(name,
            AudioVolumeScalerOp(cfgDouble(cfg, "default_scale", 1.0),
              hasCtl, lo, hi),
            ins, out("out_topic"))
        case "audiovolumemeter" =>
          // AudioVolumeMeterConfig (audiovolumemeter.py:18-24): rate,
          // time_window (ms), sample_format → max dtype value
          val maxV = cfgString(cfg, "sample_format", "s16") match {
            case "s16" => 32767.0
            case "s32" => Int.MaxValue.toDouble
            case _ => 1.0 // max_dtype_value: floating ⇒ 1
          }
          TaskSpec(name,
            AudioVolumeMeterOp(cfgDouble(cfg, "rate", 32000.0).toLong,
              cfgDouble(cfg, "time_window", 1000.0).toLong, maxV),
            Seq(in("in_topic")), out("out_topic"))
        case "videoreformatter" =>
          TaskSpec(name, VideoReformatterOp,
            Seq(in("in_topic")), out("out_topic"))
        case "videolayout" =>
          // VideoLayoutConfigBase (videolayout.py:18-30)
          def ci(k: String, d: Double) = cfgDouble(cfg, k, d).toInt
          TaskSpec(name, VideoLayoutOp(
            ci("in_width", 1280), ci("in_height", 720),
            ci("place_width", 1280), ci("place_height", 720),
            ci("place_top_offset", 0), ci("place_left_offset", 0),
            ci("out_width", 1280), ci("out_height", 720)),
            Seq(in("in_topic")), out("out_topic"))
        case "videoactivitymeter" =>
          TaskSpec(name, VideoActivityMeterOp,
            Seq(in("in_topic")), out("out_topic"))
        case "videomixer" =>
          // VideoMixerConfig (videomixer.py:22-60): video_tracks with
          // per-track in_topic
          val tracks = cfg \ "video_tracks" match {
            case JArray(ts) => ts
            case _ => Nil
          }
          require(tracks.nonEmpty, s"$ctx: video mixer needs tracks")
          // pixel_format picks the alpha channel position: the
          // reference's mixer default is bgra (videomixer.py:28 — an
          // alpha-LAST layout); argb/abgr put it first
          val pf = cfgString(cfg, "pixel_format", "bgra")
          TaskSpec(name,
            VideoMixerOp(tracks.size, alphaFront = pf.startsWith("a")),
            tracks.map(t => stream(cfgTopic(t, "in_topic", ctx))),
            out("out_topic"))
        case "videoencoder" =>
          // gop_size rides codec_options in the reference
          // (options_from_codec_context); engine default 4 (m09's GOP)
          val gop = cfgDouble(cfg \ "codec_options", "gop_size", 4.0).toInt
          TaskSpec(name, VideoEncoderOp(gop),
            Seq(in("in_topic")), out("out_topic"))
        case "videodecoder" =>
          TaskSpec(name, VideoDecoderOp,
            Seq(in("in_topic")), out("out_topic"))
        case "textrenderer" =>
          // TextRendererConfigBase (textrenderer.py:37-45); font_color
          // "#rrggbb" → packed rgb
          val colorHex = cfgString(cfg, "font_color", "#000000")
          require(colorHex.matches("#[0-9a-fA-F]{6}"),
            s"$ctx: bad font_color '$colorHex'")
          TaskSpec(name, TextRendererOp(
            cfgDouble(cfg, "width", 1280.0).toInt,
            cfgDouble(cfg, "height", 720.0).toInt,
            cfgDouble(cfg, "x", 0.0).toInt, cfgDouble(cfg, "y", 0.0).toInt,
            Integer.parseInt(colorHex.substring(1), 16)),
            Seq(in("in_topic")), out("out_topic"))
        case "imagerenderer" =>
          // ImageRendererConfig (imagerenderer.py:16-30): `source`
          // names the image; the engine takes the decoded frame bytes
          // inline (engine extension `frame_hex`) and the tick stream
          // as input (the pulse-generator convention replaces the
          // reference's repeat_interval wall clock)
          val fh = cfgString(cfg, "frame_hex", "")
          require(fh.nonEmpty,
            s"$ctx: frame_hex required (decoded image bytes)")
          TaskSpec(name, ImageRendererOp(fh),
            Seq(in("tick_topic")), out("out_topic"))
        case "asrspeechrecognition" =>
          // ASRSpeechRecognitionConfig (asrspeechrecognition.py:22-30):
          // `source` names the checkpoint (the engine's trained head
          // ships in the jar); chunk_size scales the per-inference
          // window — engine extension `chunk_samples` overrides the
          // model feature dim directly
          TaskSpec(name,
            AsrOp(cfgDouble(cfg, "chunk_samples", 8.0).toInt),
            Seq(in("in_topic")), out("out_topic"))
        case "fastspeech2tts" =>
          // FastSpeech2TTSConfig (fastspeech2tts.py:38-47): pace
          // scales duration — samples_per_char = round(8 · pace)
          val spc = math.max(1,
            math.round(8.0 * cfgDouble(cfg, "pace", 1.0)).toInt)
          TaskSpec(name, TtsOp(spc), Seq(in("in_topic")), out("out_topic"))
        case "smespeechenhancement" | "waveformspeechenhancement" =>
          // SMESpeechEnhancementConfig (smespeechenhancement.py:21-32);
          // engine extension `threshold` parameterizes the gate kernel
          TaskSpec(name,
            SpeechEnhanceOp(cfgDouble(cfg, "threshold", 50.0)),
            Seq(in("in_topic")), out("out_topic"))
        case "audiomixer" =>
          // AudioMixerConfig (audiomixer.py:27-46): audio_tracks with
          // per-track in_topic
          val tracks = cfg \ "audio_tracks" match {
            case JArray(ts) => ts
            case _ => Nil
          }
          require(tracks.nonEmpty, s"$ctx: audio mixer needs tracks")
          TaskSpec(name, AudioMixerOp(tracks.size),
            tracks.map(t => stream(cfgTopic(t, "in_topic", ctx))),
            out("out_topic"))
        case "audioencoder" =>
          TaskSpec(name, AudioEncoderOp(cfgString(cfg, "codec", "pcm_mulaw")),
            Seq(in("in_topic")), out("out_topic"))
        case "audiodecoder" =>
          TaskSpec(name, AudioDecoderOp(cfgString(cfg, "codec", "pcm_mulaw")),
            Seq(in("in_topic")), out("out_topic"))
        case "audioresampler" =>
          TaskSpec(name, AudioResamplerOp(
            cfgDouble(cfg, "in_rate", 32000.0).toLong,
            cfgDouble(cfg, "out_rate", 32000.0).toLong),
            Seq(in("in_topic")), out("out_topic"))
        case other => sys.error(s"$ctx: unsupported task kind '$other'")
      })
    }
    // external feeds: consumed-but-never-produced topics → SourceOp
    val producedS = tasks.flatMap(_.outputs).toSet
    val external = tasks.flatMap(t =>
      t.inputs.zip(t.op.inMeta).filterNot(p => producedS(p._1)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (s, metas) => (s, metas.head._2) }
    val sources = external.map { case (s, meta) =>
      addIn(s, s, "external feed '" + s + "'")
      // task names key state stores — never collide with a loaded label
      val base = s"src_$s"
      val nm = if (seen.add(base)) base else {
        var i = 2
        while (!seen.add(s"${base}_$i")) i += 1
        s"${base}_$i"
      }
      TaskSpec(nm, SourceOp(meta), Nil, s)
    }
    Loaded(Deployment(depLabel, sources ++ tasks),
      namedIn.toMap, namedOut.toMap)
  }

  /** IOMeta from a StoredTask IO metadata dict (string-valued fields;
    * wiring/UI keys dropped, as the reference's compatibility check
    * does — docs/io-metadata.md). */
  private def ioMeta(j: JValue): IOMeta = j match {
    case JObject(fields) => IOMeta(fields.collect {
      case (k, JString(v)) if !Set("label", "key", "topic_id")(k) => k -> v
    }.toMap)
    case _ => IOMeta(Map("type" -> "ts"))
  }

  // --------------------------------------------------------------- writing

  /** Serialize a deployment to the stored-task JSON shape. Kind names
    * are used as `task_host_id` (portable — no node hash); topic ids
    * are assigned by first use over the task list, so the output is
    * deterministic and `load(write(dep))` is a fixpoint up to stream
    * renaming (PipelineSpec pins `write(load(write(d))) == write(d)`). */
  def write(dep: Deployment): String = {
    val ids = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def id(s: String): Long = ids.getOrElseUpdate(s, ids.size + 1L)
    // assign ids in task order, outputs before downstream inputs
    dep.tasks.foreach { t => t.inputs.foreach(id); t.outputs.foreach(id) }
    def taskId(t: TaskSpec): String = {
      val h = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"${dep.name}/${t.name}".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      s"${h.substring(0, 8)}-${h.substring(8, 12)}-4${h.substring(13, 16)}-" +
        s"8${h.substring(17, 20)}-${h.substring(20, 32)}"
    }
    def metaJson(m: IOMeta, extra: (String, JValue)*): JObject =
      JObject(m.fields.toSeq.sortBy(_._1).map { case (k, v) =>
        k -> (JString(v): JValue) }.toList ++ extra.toList)
    def topic(s: String): JValue = JLong(id(s))

    def ioJson(t: TaskSpec, side: String): List[JValue] =
      if (side == "in")
        t.inputs.zip(t.op.inMeta).map { case (s, m) =>
          metaJson(m, "topic_id" -> topic(s)): JValue }.toList
      else
        t.outputs.zip(t.op.outMetas).map { case (s, m) =>
          metaJson(m, "topic_id" -> topic(s)): JValue }.toList

    def switchCfg(t: TaskSpec, n: Int): JObject = JObject(
      "pairs" -> JArray((0 until n).map(i => JObject(
        "input" -> topic(t.inputs(2 * i)),
        "control" -> topic(t.inputs(2 * i + 1))): JValue).toList),
      "output" -> topic(t.output))

    def inOutCfg(t: TaskSpec): JObject = JObject(
      "in_topic" -> topic(t.inputs.head), "out_topic" -> topic(t.output))

    val tasksJson = dep.tasks.map { t =>
      val (kind, cfg, ins, outs): (String, JObject, List[JValue], List[JValue]) =
        t.op match {
          case SourceOp(meta) =>
            ("namedinput",
              JObject("name" -> JString(t.name), "out_topic" -> topic(t.output)),
              Nil, List(metaJson(meta, "topic_id" -> topic(t.output))))
          case NamedOutputOp(n, meta) =>
            ("namedoutput",
              JObject("name" -> JString(n), "in_topic" -> topic(t.inputs.head)),
              List(metaJson(meta, "topic_id" -> topic(t.inputs.head))), Nil)
          case GateOp(failOpen) =>
            ("gate", JObject(
              "fail_mode" -> JString(if (failOpen) "open" else "closed"),
              "synchronized" -> JBool(true),
              "initial_control" -> JBool(false),
              "in_topic" -> topic(t.inputs(0)),
              "control_topic" -> topic(t.inputs(1)),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case CalculatorOp(formula, vars, defaults) =>
            ("calculator", JObject(
              "formula" -> JString(formula),
              "synchronized" -> JBool(true),
              "variable_tracks" -> JArray(vars.zipWithIndex.map {
                case (v, i) => JObject(
                  "name" -> JString(v),
                  "default_value" -> JDouble(defaults.getOrElse(v, 0.0)),
                  "in_topic" -> topic(t.inputs(i))): JValue
              }.toList),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case SwitchOp(n) =>
            ("switch", switchCfg(t, n), ioJson(t, "in"), ioJson(t, "out"))
          case MediaSwitchOp(n) =>
            ("mediaswitch", switchCfg(t, n), ioJson(t, "in"), ioJson(t, "out"))
          case SrLatchOp =>
            ("srlatch", JObject(
              "set_topic" -> topic(t.inputs(0)),
              "reset_topic" -> topic(t.inputs(1)),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case StringMatcherOp(p) =>
            ("stringmatcher", JObject(
              "pattern" -> JString(p), "is_regex" -> JBool(true),
              "flags" -> JString(""),
              "in_topic" -> topic(t.inputs.head),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case NumberToTextOp =>
            ("numbertotext", inOutCfg(t), ioJson(t, "in"), ioJson(t, "out"))
          case TimestampUpdaterOp(off) =>
            ("timestampupdater", JObject(
              "time_offset" -> JLong(off), "fail_closed" -> JBool(true),
              "in_topic" -> topic(t.inputs.head),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case op: TimeToTextOp =>
            ("timetotext", JObject(
              "date_format" -> JString(op.pattern),
              "in_topic" -> topic(t.inputs.head),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case TextFormatterOp(template, vars) =>
            ("textformatter", JObject(
              "template" -> JString(template),
              "synchronized" -> JBool(true),
              "variable_tracks" -> JArray(vars.zipWithIndex.map {
                case (v, i) => JObject(
                  "name" -> JString(v), "default_text" -> JString(""),
                  "in_topic" -> topic(t.inputs(i))): JValue
              }.toList),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case StringConcatenatorOp =>
            ("stringconcatenator", JObject(
              "in_topic" -> topic(t.inputs(0)),
              "control_topic" -> topic(t.inputs(1)),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case MessageDetectorOp(ms) =>
            ("messagedetector", JObject(
              "time_out" -> JDouble(ms / 1000.0),
              "repeat_interval" -> JDouble(0.0),
              "in_topic" -> topic(t.inputs.head),
              "signal_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case TimeBufferOp(ms) =>
            ("timebuffer", JObject(
              "size" -> JLong(ms),
              "in_topic" -> topic(t.inputs.head),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case RepeaterOp =>
            ("repeater", JObject(
              "rate" -> JDouble(10.0), "fail_closed" -> JBool(false),
              "in_topic" -> topic(t.inputs(0)),
              "tick_topic" -> topic(t.inputs(1)),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case SynchronizerOp(metas) =>
            ("synchronizer", JObject(
              "topics" -> JArray(metas.indices.map(i =>
                JArray(List(topic(t.inputs(i)), topic(t.outputs(i))))
                  : JValue).toList)),
              ioJson(t, "in"), ioJson(t, "out"))
          case ReplayBufferOp(loop) =>
            ("replaybuffer", JObject(
              "loop" -> JBool(loop),
              "in_topic" -> topic(t.inputs(0)),
              "play_topic" -> topic(t.inputs(1)),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case OutputContainerOp(streams, maxDesync) =>
            // writer convention: frameAdv == 1 ⟺ a video stream (one
            // frame per packet); audio streams advance frame_size
            // samples. tbNum must be 1 (all engine configs are).
            streams.foreach(c => require(c.tbNum == 1,
              s"task '${t.name}': only 1/rate time bases serialize"))
            val (vid, aud) = streams.zipWithIndex.partition(_._1.frameAdv == 1L)
            ("outputcontainer", JObject(
              "destination" -> JString(""),
              "video_tracks" -> JArray(vid.map { case (c, i) => JObject(
                "rate" -> JLong(c.tbDen),
                "in_topic" -> topic(t.inputs(i))): JValue }.toList),
              "audio_tracks" -> JArray(aud.map { case (c, i) => JObject(
                "rate" -> JLong(c.tbDen),
                "frame_size" -> JLong(c.frameAdv),
                "in_topic" -> topic(t.inputs(i))): JValue }.toList),
              "max_desync" -> JLong(maxDesync),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case ChatOp(sys, budget, lm: graft.functions.BigramLm) =>
            // only the learned kernel has a stored shape — an
            // arbitrary closure is rejected below
            ("llamacppchat", JObject(
              "src_model" -> JString(lm.dir),
              "use_gpu" -> JBool(false),
              "context_length" -> JLong(budget.toLong),
              "max_tokens" -> JLong(lm.steps.toLong),
              "system_message" -> JString(sys.getOrElse("")),
              "in_topic" -> topic(t.inputs.head),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case AudioVolumeScalerOp(d, hasCtl, lo, hi) =>
            // sample_format from the dtype range (the loader's inverse)
            val fmt =
              if (lo == -32768.0 && hi == 32767.0) "s16"
              else if (lo == Int.MinValue.toDouble) "s32" else "flt"
            ("audiovolumescaler", JObject(
              List("sample_format" -> (JString(fmt): JValue),
                "rate" -> JLong(32000), "channels" -> JLong(1),
                "default_scale" -> JDouble(d),
                "synchronized" -> JBool(true),
                "in_topic" -> topic(t.inputs.head)) ++
              (if (hasCtl) List("scale_topic" -> (topic(t.inputs(1)): JValue))
               else Nil) ++
              List("out_topic" -> (topic(t.output): JValue))),
              ioJson(t, "in"), ioJson(t, "out"))
          case AudioVolumeMeterOp(rate, win, maxV) =>
            ("audiovolumemeter", JObject(
              "sample_format" -> JString(
                if (maxV == 32767.0) "s16"
                else if (maxV == Int.MaxValue.toDouble) "s32" else "flt"),
              "rate" -> JLong(rate), "time_window" -> JLong(win),
              "in_topic" -> topic(t.inputs.head),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case AsrOp(dim) =>
            ("asrspeechrecognition", JObject(
              "source" -> JString("graft/asr_tiny"),
              "device" -> JString("cpu"),
              "chunk_samples" -> JLong(dim.toLong),
              "in_topic" -> topic(t.inputs.head),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case TtsOp(spc) =>
            ("fastspeech2tts", JObject(
              "source" -> JString("graft/tts_envelope"),
              "device" -> JString("cpu"),
              "pace" -> JDouble(spc / 8.0),
              "in_topic" -> topic(t.inputs.head),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case SpeechEnhanceOp(thr) =>
            ("smespeechenhancement", JObject(
              "source" -> JString("graft/noise_gate"),
              "device" -> JString("cpu"),
              "threshold" -> JDouble(thr),
              "in_topic" -> topic(t.inputs.head),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case AudioMixerOp(n) =>
            ("audiomixer", JObject(
              "audio_tracks" -> JArray((0 until n).map(i => JObject(
                "in_topic" -> topic(t.inputs(i))): JValue).toList),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case AudioEncoderOp(codec) =>
            ("audioencoder", JObject(
              "codec" -> JString(codec), "encoder" -> JString(codec),
              "in_topic" -> topic(t.inputs.head),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case AudioDecoderOp(codec) =>
            ("audiodecoder", JObject(
              "codec" -> JString(codec), "decoder" -> JString(codec),
              "in_topic" -> topic(t.inputs.head),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case AudioResamplerOp(inR, outR) =>
            ("audioresampler", JObject(
              "in_rate" -> JLong(inR), "out_rate" -> JLong(outR),
              "in_topic" -> topic(t.inputs.head),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case VideoReformatterOp =>
            ("videoreformatter", inOutCfg(t), ioJson(t, "in"), ioJson(t, "out"))
          case VideoLayoutOp(inW, inH, pw, ph, top, left, ow, oh) =>
            ("videolayout", JObject(
              "pixel_format" -> JString("rgba"),
              "in_width" -> JLong(inW.toLong), "in_height" -> JLong(inH.toLong),
              "place_width" -> JLong(pw.toLong),
              "place_height" -> JLong(ph.toLong),
              "place_top_offset" -> JLong(top.toLong),
              "place_left_offset" -> JLong(left.toLong),
              "out_width" -> JLong(ow.toLong), "out_height" -> JLong(oh.toLong),
              "in_topic" -> topic(t.inputs.head),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case VideoActivityMeterOp =>
            ("videoactivitymeter", inOutCfg(t), ioJson(t, "in"), ioJson(t, "out"))
          case VideoMixerOp(n, alphaFront) =>
            ("videomixer", JObject(
              "pixel_format" -> JString(if (alphaFront) "argb" else "bgra"),
              "video_tracks" -> JArray((0 until n).map(i => JObject(
                "in_topic" -> topic(t.inputs(i))): JValue).toList),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case VideoEncoderOp(gop) =>
            ("videoencoder", JObject(
              "codec" -> JString("delta"), "encoder" -> JString("delta"),
              "codec_options" -> JObject("gop_size" -> JLong(gop.toLong)),
              "in_topic" -> topic(t.inputs.head),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case VideoDecoderOp =>
            ("videodecoder", inOutCfg(t), ioJson(t, "in"), ioJson(t, "out"))
          case TextRendererOp(w, h, x, y, rgb) =>
            ("textrenderer", JObject(
              "width" -> JLong(w.toLong), "height" -> JLong(h.toLong),
              "x" -> JLong(x.toLong), "y" -> JLong(y.toLong),
              "font_color" -> JString(f"#$rgb%06x"),
              "in_topic" -> topic(t.inputs.head),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case ImageRendererOp(fh) =>
            ("imagerenderer", JObject(
              "source" -> JString(""), "frame_hex" -> JString(fh),
              "tick_topic" -> topic(t.inputs.head),
              "out_topic" -> topic(t.output)),
              ioJson(t, "in"), ioJson(t, "out"))
          case op =>
            sys.error(s"task '${t.name}': ${op.getClass.getSimpleName} has " +
              "no stored-task JSON shape (closure-configured op)")
        }
      JObject(
        "id" -> JString(taskId(t)),
        "deployment_id" -> JString(depId(dep)),
        "task_host_id" -> JString(kind),
        "label" -> JString(t.name),
        "config" -> cfg,
        "frontend_config" -> JObject(),
        "inputs" -> JArray(ins),
        "outputs" -> JArray(outs)): JValue
    }

    JsonMethods.compact(JsonMethods.render(JObject(
      "deployment" -> JObject(
        "id" -> JString(depId(dep)), "label" -> JString(dep.name)),
      "tasks" -> JArray(tasksJson.toList))))
  }

  private def depId(dep: Deployment): String = {
    val h = java.security.MessageDigest.getInstance("SHA-256")
      .digest(dep.name.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    s"${h.substring(0, 8)}-${h.substring(8, 12)}-4${h.substring(13, 16)}-" +
      s"8${h.substring(17, 20)}-${h.substring(20, 32)}"
  }
}

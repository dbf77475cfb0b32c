package graft.streaming

/** Pure state machines for the reference's stateful stream operators
  * (SURVEY §2.1) — the exact per-message semantics of
  * /root/reference/streamtasks/system/tasks/{gate,switch,srlatch,
  * stringconcatenator,messagedetector,calculator}.py, expressed as
  * referentially transparent `(state, event) → (state, emits)` steps.
  *
  * One implementation, two execution modes: [[StatefulRunner]] mounts
  * these on `flatMapGroupsWithState` (streaming) and `flatMapGroups`
  * (batch), both feeding events in (timestamp, priority, seq) order —
  * the order the reference's `PrioritizedSequentialInTopicSynchronizer`
  * establishes (client/topic.py:142-165). Keeping the machines pure
  * makes the semantics unit-testable without a SparkSession and
  * guarantees the batch and streaming paths can't drift apart.
  */
object StateMachines {

  /** A message on one input of an operator.
    *
    * @param topic which input (operator-local index)
    * @param ts    event time, integer ms
    * @param value NumberMessage payload (NaN if text message)
    * @param text  TextMessage payload (null if number message)
    * @param paused control-marker row: the topic's pause flag changed
    *               (SURVEY §7.4 — pause/control as in-band marker rows)
    */
  final case class Ev(topic: Int, ts: Long, value: Double, text: String,
      paused: Boolean)

  /** An emitted message. `paused = true` marks an in-band output pause
    * transition (the reference's TopicControlMessage,
    * net/messages.py:36-41): `value` carries the new flag (1.0 paused,
    * 0.0 resumed). */
  final case class Out(ts: Long, value: Double, text: String,
      paused: Boolean = false)

  /** Decode a pause-marker row's flag: `value ≤ 0.5` resumes, anything
    * else — including the NaN of a bare marker — pauses. */
  def pauseFlag(e: Ev): Boolean = !(e.value <= 0.5)

  /** An operator state machine: fold events, emit outputs. */
  trait Machine[S] extends Serializable {
    def init: S
    def step(s: S, e: Ev): (S, Seq[Out])
    /** Priority of a topic at equal timestamps — lower sorts first
      * (gate: control first; concatenator: data first). */
    def priority(topic: Int): Int = topic
    /** Machines that consume events in ARRIVAL order (the reference's
      * per-topic receiver order, client/topic.py:170-186) rather than
      * timestamp order — the runner then sorts a batch by `seq` alone,
      * with `seq` carrying the mount's deterministic arrival rank.
      * The synchronizer family is the reason this exists: its
      * late-drop rule is DEFINED by arrival order running against
      * timestamp order, so a (ts, …) pre-sort would define it away. */
    def arrivalOrder: Boolean = false
  }

  /** A machine that also emits without input — on a processing-time
    * timeout in streaming, and once at end-of-input in batch (detector
    * trailing edge, synchronizer flush, repeater tick). A machine that
    * keeps ticking (repeater) overrides [[removeOnTimeout]] so its
    * state survives and the timeout re-arms. */
  trait Timed[S] {
    def onTimeout(s: S): Seq[Out]
    def removeOnTimeout: Boolean = true
  }

  /** Learned stream-clock offset (utils.py:299-304): `update` records
    * how far message time runs from the local clock; `time` projects
    * the stream clock onto "now". The clock is injected so restamping
    * is deterministic under test and swappable for executor-local
    * clocks at scale. */
  final class TimeSync(clock: () => Long) extends Serializable {
    private var offset = 0L
    def update(ts: Long): Unit = offset = ts - clock()
    def time: Long = clock() + offset
    def reset(): Unit = offset = 0L
  }

  /** Machine mount of [[TimeSync]] ITSELF — restamping with a learned
    * stream-vs-local-clock offset (utils.py:299-304 used the way the
    * reference's tasks use it): each message is emitted at the
    * projection of the stream clock onto the local clock (`sync.time`
    * with the offset learned from the PREVIOUS message), then the
    * offset re-learns from this message. The local clock is INJECTED
    * (`localClock(e.ts)` = "now" as this message arrives), which is
    * what makes the operator deterministic and oracle-expressible —
    * out_i = clock(ts_i) + (ts_{i−1} − clock(ts_{i−1})), a lag
    * window — while production swaps in the executor wall clock
    * unchanged. Holds a mutable [[TimeSync]]: batch mount only
    * (per-key sequential fold; the streaming analogue would carry the
    * offset Long in the state store). */
  final class TimeSyncRestamp(localClock: Long => Long)
      extends Machine[(TimeSync, Array[Long])] {
    def init: (TimeSync, Array[Long]) = {
      val now = Array(0L)
      (new TimeSync(() => now(0)), now)
    }
    def step(s: (TimeSync, Array[Long]), e: Ev)
        : ((TimeSync, Array[Long]), Seq[Out]) = {
      // pause markers are CONTROL: forward untouched — restamping one
      // as data would fabricate a message, and learning the offset
      // from a marker timestamp would corrupt the clock model
      if (e.paused) (s, Seq(Out(e.ts, e.value, e.text, paused = true)))
      else {
        val (sync, now) = s
        now(0) = localClock(e.ts)
        val out = Out(sync.time, e.value, e.text)
        sync.update(e.ts)
        (s, Seq(out))
      }
    }
  }

  // ------------------------------------------------------------------ gate
  /** gate.py:31-93, exact GateState semantics. Topic 0 = data, topic 1
    * = control. Open iff the input is unpaused AND the last control
    * value was > 0.5 AND, in fail-CLOSED mode only, the control topic
    * is neither paused nor errored (gate.py:38-41 — fail-OPEN keeps
    * trusting the last control value through pauses/errors). Invalid
    * (NaN) control values error the control topic until the next valid
    * one (gate.py:75-80). Control before data at equal ts
    * (gate.py:52-54). Output pause transitions are emitted in-band as
    * marker rows, the reference's `run_out_pauser` (gate.py:82-85):
    * downstream tasks observe `output_paused = !open`. */
  final case class GateState(control: Boolean, ctrlPaused: Boolean,
      ctrlErrored: Boolean, inputPaused: Boolean, outPaused: Boolean)
  final class Gate(failOpen: Boolean, initialControl: Boolean = false)
      extends Machine[GateState] {
    private def openOf(s: GateState): Boolean =
      !s.inputPaused && s.control &&
        (failOpen || (!s.ctrlPaused && !s.ctrlErrored))
    def init = {
      val s = GateState(initialControl, ctrlPaused = false,
        ctrlErrored = false, inputPaused = false, outPaused = false)
      s.copy(outPaused = !openOf(s))
    }
    override def priority(topic: Int): Int = if (topic == 1) 0 else 1
    def step(s: GateState, e: Ev): (GateState, Seq[Out]) = {
      val s1 = e.topic match {
        case 1 =>
          if (e.paused) s.copy(ctrlPaused = pauseFlag(e))
          else if (e.value.isNaN) s.copy(ctrlErrored = true) // invalid msg
          else s.copy(control = e.value > 0.5, ctrlErrored = false)
        case _ =>
          if (e.paused) s.copy(inputPaused = pauseFlag(e)) else s
      }
      val open = openOf(s1)
      val fwd =
        if (e.topic == 0 && !e.paused && open) Seq(Out(e.ts, e.value, e.text))
        else Nil
      val nowPaused = !open
      val marker = // run_out_pauser: emit only on transition
        if (nowPaused == s1.outPaused) Nil
        else Seq(Out(e.ts, if (nowPaused) 1.0 else 0.0, null, paused = true))
      (s1.copy(outPaused = nowPaused), fwd ++ marker)
    }
  }

  // ------------------------------------------------------------- SR latch
  /** srlatch.py:33-55 — LEVEL-based, not edge-based: the task holds the
    * last received boolean LEVEL of each input (`set_value`,
    * `reset_value`, srlatch.py:33-34,47) and on every valid message
    * re-derives the output: the latch flips only while the levels
    * DISAGREE (`if self.set_value != self.reset_value`, srlatch.py:52-54);
    * equal levels — both high or both low — hold the current value. So a
    * hot reset message while the set level is still high is a no-change
    * emit, which an event-based formulation gets wrong. Invalid (NaN)
    * messages are skipped without emitting (ValidationError,
    * srlatch.py:48); pause markers never reach the task (`recv_data`,
    * srlatch.py:45). Topic 0 = set, topic 1 = reset; emits the current
    * state (0/1) on every valid message. */
  final case class LatchState(setVal: Boolean, resetVal: Boolean, value: Boolean)
  final class SrLatch(defaultValue: Boolean = false) extends Machine[LatchState] {
    def init = LatchState(setVal = false, resetVal = false, value = defaultValue)
    def step(s: LatchState, e: Ev): (LatchState, Seq[Out]) = {
      if (e.paused || e.value.isNaN) return (s, Nil)
      val hot = e.value > 0.5
      val s1 = if (e.topic == 0) s.copy(setVal = hot) else s.copy(resetVal = hot)
      val v = if (s1.setVal != s1.resetVal) s1.setVal else s1.value
      (s1.copy(value = v), Seq(Out(e.ts, if (v) 1.0 else 0.0, null)))
    }
  }

  // --------------------------------------------------------------- switch
  /** switch.py:29-72, exact semantics. Topics 2k = data of pair k,
    * 2k+1 = control of pair k.
    *
    *  - `control_values` is a python dict (switch.py:27) — INSERTION
    *    ordered. The selected pair is the FIRST pair in insertion order
    *    whose latest control value equals the max (`_get_selected_index`,
    *    :69-72); with no control values yet it is -1, so NO data
    *    forwards before the first valid control message.
    *  - A control-topic pause POPS the pair's value (:57-58) — the pair
    *    leaves both the max and the insertion order; a later control
    *    message re-inserts it at the END of insertion order.
    *  - Invalid (NaN) control messages are skipped (ValidationError,
    *    :63). Data is forwarded raw, unvalidated (:52).
    *  - Output pause mirrors the SELECTED input's pause flag: synced on
    *    every receive on the selected data topic (:51) and on every
    *    valid control message while a pair is selected (`set_value`,
    *    :65-68); `OutTopic.set_paused` emits only on transition
    *    (client/topic.py:232-235) → in-band marker rows on transition.
    */
  final case class SwitchState(ctrl: Vector[(Int, Double)],
      dataPaused: Set[Int], outPaused: Boolean)
  final class Switch(pairs: Int) extends Machine[SwitchState] {
    def init = SwitchState(Vector.empty, Set.empty, outPaused = false)
    override def priority(topic: Int): Int = if (topic % 2 == 1) 0 else 1
    private[streaming] def selected(s: SwitchState): Int =
      if (s.ctrl.isEmpty) -1
      else {
        val mx = s.ctrl.iterator.map(_._2).max
        s.ctrl.find(_._2 == mx).get._1
      }
    /** out_topic.set_paused(flag): marker row on transition only. */
    private[streaming] def syncOut(s: SwitchState, flag: Boolean, ts: Long): (SwitchState, Seq[Out]) =
      if (flag == s.outPaused) (s, Nil)
      else (s.copy(outPaused = flag),
        Seq(Out(ts, if (flag) 1.0 else 0.0, null, paused = true)))
    def step(s: SwitchState, e: Ev): (SwitchState, Seq[Out]) = {
      val k = e.topic / 2
      if (e.topic % 2 == 1) { // control topic of pair k
        if (e.paused) {
          if (pauseFlag(e)) (s.copy(ctrl = s.ctrl.filterNot(_._1 == k)), Nil)
          else (s, Nil) // resume alone does not re-insert (switch.py:57-58)
        } else if (e.value.isNaN) (s, Nil) // ValidationError → pass
        else {
          val ctrl2 =
            if (s.ctrl.exists(_._1 == k))
              s.ctrl.map { case (p, v) => if (p == k) (p, e.value) else (p, v) }
            else s.ctrl :+ (k -> e.value)
          val s1 = s.copy(ctrl = ctrl2)
          val sel = selected(s1)
          if (sel != -1) syncOut(s1, s1.dataPaused(sel), e.ts) else (s1, Nil)
        }
      } else { // data topic of pair k
        val s1 =
          if (e.paused)
            s.copy(dataPaused =
              if (pauseFlag(e)) s.dataPaused + k else s.dataPaused - k)
          else s
        if (selected(s1) == k) {
          val (s2, m) = syncOut(s1, s1.dataPaused(k), e.ts)
          // forward the whole message (switch.py forwards the message
          // object, text included — e28 rides event ids through this)
          if (!e.paused) (s2, m :+ Out(e.ts, e.value, e.text)) else (s2, m)
        } else (s1, Nil)
      }
    }
  }

  // --------------------------------------------------------- media switch
  /** media switch (media/mediaswitch.py:11-27): a [[Switch]] whose
    * cutover defers to the next keyframe of the newly SELECTED input —
    * `_active_index` starts at -1 (:13) and flips to the selected pair
    * only when that pair delivers a keyframe (:20-24); data forwards
    * while `idx == active` (:25-26). Data events carry `text = "k"`
    * when the frame is a keyframe (stand-in for packet.is_keyframe).
    * Selection, control pops, and output-pause mirroring are inherited
    * from the switch (same `_get_selected_index` / `set_paused` paths). */
  final case class MediaSwitchState(sw: SwitchState, active: Int)
  final class MediaSwitch(pairs: Int) extends Machine[MediaSwitchState] {
    private val inner = new Switch(pairs)
    def init = MediaSwitchState(inner.init, active = -1)
    override def priority(topic: Int): Int = if (topic % 2 == 1) 0 else 1
    /** packet.is_keyframe stand-ins: the bare "k" tag of the raw-frame
      * fixtures AND the "k|<hex>" framing [[graft.functions.Codec]]'s
      * delta/motion encoders emit (the doc on DeltaEncoder promises
      * the media switch reads the same flag). */
    private def isKeyframe(text: String): Boolean =
      text != null && (text == "k" || text.startsWith("k|"))
    def step(s: MediaSwitchState, e: Ev): (MediaSwitchState, Seq[Out]) = {
      val k = e.topic / 2
      if (e.topic % 2 == 1) { // control path: exactly the switch's
        val (sw2, outs) = inner.step(s.sw, e)
        (s.copy(sw = sw2), outs)
      } else {
        // data path (mediaswitch.py:15-26): the topic's pause flag
        // updates on receipt, then the selected check, pause sync,
        // keyframe cutover, send — in that order. Selection and the
        // transition-only output-pause marker are the switch's own
        // rules, reused (not re-implemented).
        val sw1 =
          if (e.paused)
            s.sw.copy(dataPaused =
              if (pauseFlag(e)) s.sw.dataPaused + k else s.sw.dataPaused - k)
          else s.sw
        if (inner.selected(sw1) == k) {
          val (sw2, markers) = inner.syncOut(sw1, sw1.dataPaused(k), e.ts)
          if (e.paused) (s.copy(sw = sw2), markers)
          else {
            val active2 = if (k != s.active && isKeyframe(e.text)) k else s.active
            val fwd = if (k == active2) Seq(Out(e.ts, e.value, e.text)) else Nil
            (MediaSwitchState(sw2, active2), markers ++ fwd)
          }
        } else (s.copy(sw = sw1), Nil)
      }
    }
  }

  // --------------------------------------------------------- text formatter
  /** text formatter (textformatter.py:62-75): template over the last
    * value of each named text variable, emitted on every VALID
    * arrival; ANY control marker resets the variable to its default
    * "" without emitting (textformatter.py:65); invalid (null-text)
    * messages are skipped — no var update, no emit (ValidationError,
    * textformatter.py:71). */
  final case class FormatterState(vars: Map[Int, String])
  final class TextFormatter(inputs: Int,
      format: Map[Int, String] => String) extends Machine[FormatterState] {
    def init = FormatterState((0 until inputs).map(_ -> "").toMap)
    def step(s: FormatterState, e: Ev): (FormatterState, Seq[Out]) = {
      if (e.paused)
        (FormatterState(s.vars + (e.topic -> "")), Nil)
      else if (e.text == null) (s, Nil) // ValidationError → pass
      else {
        val next = FormatterState(s.vars + (e.topic -> e.text))
        (next, Seq(Out(e.ts, Double.NaN, format(next.vars))))
      }
    }
  }

  // ------------------------------------------------- string concatenator
  /** stringconcatenator.py:42-62, exact semantics. Topic 0 = text,
    * topic 1 = control; data before control at equal ts
    * (stringconcatenator.py:25-27).
    *
    *  - The flush fires on a control rising edge (≤0.5 → >0.5) ONLY
    *    when the accumulator is non-empty (`len(self.value) > 0`,
    *    :50-52) — an empty rising edge emits nothing (and there is
    *    nothing to clear). `last_control` updates on every VALID
    *    control message (:53); invalid (NaN) messages are skipped
    *    without touching it (ValidationError, :54).
    *  - A control-topic pause marker is forwarded to the OUTPUT's pause
    *    flag (`set_paused(data.paused)`, :47), transition-deduplicated
    *    by OutTopic (client/topic.py:232-235). Data-topic markers never
    *    reach the task (`recv_data`, :59). */
  final case class ConcatState(acc: String, lastCtrl: Double, outPaused: Boolean)
  final class StringConcatenator extends Machine[ConcatState] {
    def init = ConcatState("", 0.0, outPaused = false)
    override def priority(topic: Int): Int = if (topic == 0) 0 else 1
    def step(s: ConcatState, e: Ev): (ConcatState, Seq[Out]) = e.topic match {
      case 0 =>
        if (e.paused || e.text == null) (s, Nil)
        else (s.copy(acc = s.acc + e.text), Nil)
      case _ =>
        if (e.paused) {
          val flag = pauseFlag(e)
          if (flag == s.outPaused) (s, Nil)
          else (s.copy(outPaused = flag),
            Seq(Out(e.ts, if (flag) 1.0 else 0.0, null, paused = true)))
        }
        else if (e.value.isNaN) (s, Nil) // ValidationError → pass
        else {
          val rising = s.lastCtrl <= 0.5 && e.value > 0.5 && s.acc.nonEmpty
          if (rising) (ConcatState("", e.value, s.outPaused),
            Seq(Out(e.ts, Double.NaN, s.acc)))
          else (s.copy(lastCtrl = e.value), Nil)
        }
    }
  }

  // ------------------------------------------------------------ detector
  /** messagedetector.py:30-88, event-time mode: 1 on every message;
    * when the gap to the next message exceeds `timeoutMs`, a 0 at
    * lastTs + timeout. The trailing 0 is emitted by the runner on
    * state timeout (streaming) or end-of-group (batch). */
  final case class DetectorState(lastTs: Long, up: Boolean)
  final class MessageDetector(timeoutMs: Long) extends Machine[DetectorState]
      with Timed[DetectorState] {
    def init = DetectorState(Long.MinValue, up = false)
    def step(s: DetectorState, e: Ev): (DetectorState, Seq[Out]) = {
      if (e.paused) return (s, Nil)
      val gapped = s.up && e.ts - s.lastTs > timeoutMs
      val downs = if (gapped) Seq(Out(s.lastTs + timeoutMs, 0.0, null)) else Nil
      (DetectorState(e.ts, up = true), downs :+ Out(e.ts, 1.0, null))
    }
    /** Final 0 after the last message (timeout path). */
    def onTimeout(s: DetectorState): Seq[Out] =
      if (s.up) Seq(Out(s.lastTs + timeoutMs, 0.0, null)) else Nil
  }

  // ---------------------------------------------------------- calculator
  /** calculator.py:227-240: hold last value per variable topic,
    * re-evaluate and emit on every arriving VALID message with that
    * message's timestamp. ANY control marker (pause or resume) resets
    * the variable to its default without emitting (calculator.py:230);
    * invalid (NaN) messages are skipped entirely — no var update, no
    * emit (ValidationError, calculator.py:236). */
  final case class CalcState(vars: Map[Int, Double])
  final class Calculator(defaults: Map[Int, Double], eval: Map[Int, Double] => Double)
      extends Machine[CalcState] {
    def init = CalcState(defaults)
    def step(s: CalcState, e: Ev): (CalcState, Seq[Out]) = {
      if (e.paused) (CalcState(s.vars + (e.topic -> defaults.getOrElse(e.topic, 0.0))), Nil)
      else if (e.value.isNaN) (s, Nil) // ValidationError → pass
      else {
        val next = CalcState(s.vars + (e.topic -> e.value))
        (next, Seq(Out(e.ts, eval(next.vars), null)))
      }
    }
  }

  // ----------------------------------------------------------- time buffer
  /** timebuffer.py:38-63, message mode, exact semantics:
    *
    *  - release the head while the TOP (latest) message's timestamp
    *    runs ≥ sizeMs ahead of it — the `len > 1` loop of :47-60 (the
    *    top message itself can never release by the time rule). With
    *    synchronizer-ordered input the top timestamp is the running
    *    max, which is what `newest` tracks;
    *  - while the input is PAUSED, a single remaining message flushes
    *    (`len == 1 and paused`, :62) — the buffer drains fully on a
    *    paused stream instead of trapping its last message;
    *  - the output pause flag mirrors `paused AND empty` (:63), as an
    *    in-band marker row on transition;
    *  - remaining messages stay buffered at end of input (the
    *    reference holds them until more data; batch analogue e12
    *    matches). */
  final case class TimeBufState(buf: Vector[(Long, Double, String)],
      newest: Long, inPaused: Boolean, outPaused: Boolean)
  final class TimeBuffer(sizeMs: Long) extends Machine[TimeBufState] {
    def init = TimeBufState(Vector.empty, Long.MinValue, inPaused = false,
      outPaused = false)
    def step(s: TimeBufState, e: Ev): (TimeBufState, Seq[Out]) = {
      val st =
        if (e.paused) s.copy(inPaused = pauseFlag(e))
        else s.copy(buf = s.buf :+ ((e.ts, e.value, e.text)),
          newest = math.max(s.newest, e.ts))
      var buf = st.buf
      val out = Vector.newBuilder[Out]
      while (buf.length > 1 && st.newest - buf.head._1 >= sizeMs) {
        val (t, v, x) = buf.head
        out += Out(t, v, x)
        buf = buf.tail
      }
      if (buf.length == 1 && st.inPaused) { // flush-on-pause (:62)
        val (t, v, x) = buf.head
        out += Out(t, v, x)
        buf = Vector.empty
      }
      val wantPaused = st.inPaused && buf.isEmpty // set_paused (:63)
      val marker =
        if (wantPaused == st.outPaused) Nil
        else Seq(Out(e.ts, if (wantPaused) 1.0 else 0.0, null, paused = true))
      (st.copy(buf = buf, outPaused = wantPaused), out.result() ++ marker)
    }
  }

  // -------------------------------------------------------------- repeater
  /** repeater.py:36-69, exact semantics: sample-and-hold re-emitted at
    * a fixed rate. Topic 0 = data (updates the held value), topic 1 =
    * clock ticks (from a rate source, SURVEY §2.1 #15 option b); each
    * tick emits the held value with the tick's timestamp.
    *
    *  - An input pause marker FORWARDS to the output pause flag
    *    (`set_paused(data.paused)`, repeater.py:40) — it does NOT
    *    clear the hold; ticks resume with the retained value after a
    *    resume. While the output is paused the sender skips its tick
    *    sends (:61).
    *  - An INVALID message (NaN value + null text ≙ no extractable
    *    timestamp, :43-47) clears the hold in fail-CLOSED mode and is
    *    forwarded raw, once, in fail-OPEN mode. */
  final case class RepeaterState(held: Double, hasValue: Boolean,
      outPaused: Boolean)
  final class Repeater(failClosed: Boolean = false)
      extends Machine[RepeaterState] {
    def init = RepeaterState(0.0, hasValue = false, outPaused = false)
    def step(s: RepeaterState, e: Ev): (RepeaterState, Seq[Out]) = e.topic match {
      case 0 =>
        if (e.paused) {
          val flag = pauseFlag(e)
          if (flag == s.outPaused) (s, Nil)
          else (s.copy(outPaused = flag),
            Seq(Out(e.ts, if (flag) 1.0 else 0.0, null, paused = true)))
        }
        else if (e.value.isNaN && e.text == null) { // invalid (:43-47)
          if (failClosed) (s.copy(hasValue = false), Nil)
          else (s, Seq(Out(e.ts, e.value, e.text)))
        }
        else (s.copy(held = e.value, hasValue = true), Nil)
      case _ =>
        // the tick topic's PAUSE markers are control, not ticks — a
        // paused rate source must not re-emit the held value
        if (!e.paused && s.hasValue && !s.outPaused)
          (s, Seq(Out(e.ts, s.held, null)))
        else (s, Nil)
    }
  }

  /** repeater.py:36-69 wall-clock mode: every data message updates both
    * the held value and the learned stream-clock offset
    * (`time_sync.update(msg_time)`, repeater.py:44); each
    * processing-time tick re-emits the held value restamped to the
    * projected stream time (`time_sync.time`, repeater.py:64) — so a
    * repeater fed by a stream whose clock runs ahead of or behind the
    * executor's emits timestamps on the STREAM's timeline, not the
    * machine's. Offset state lives in the fold (not a TimeSync field)
    * so checkpoint recovery restores it. */
  final case class WallRepState(held: Double, hasValue: Boolean,
      offset: Long, outPaused: Boolean)
  final class WallClockRepeater(clock: () => Long)
      extends Machine[WallRepState] with Timed[WallRepState] {
    def init = WallRepState(0.0, hasValue = false, 0L, outPaused = false)
    def step(s: WallRepState, e: Ev): (WallRepState, Seq[Out]) = {
      if (e.paused) {
        // pause forwards to the output flag and SILENCES the sender
        // (repeater.py:40,61) — the hold and learned offset survive
        val flag = pauseFlag(e)
        if (flag == s.outPaused) (s, Nil)
        else (s.copy(outPaused = flag),
          Seq(Out(e.ts, if (flag) 1.0 else 0.0, null, paused = true)))
      }
      else (s.copy(held = e.value, hasValue = true,
        offset = e.ts - clock()), Nil)
    }
    def onTimeout(s: WallRepState): Seq[Out] =
      if (s.hasValue && !s.outPaused)
        Seq(Out(clock() + s.offset, s.held, null))
      else Nil
    override def removeOnTimeout: Boolean = false // keep ticking
  }

  // ------------------------------------------------------------- chat
  /** llama.cpp chat (inference/llamacppchat.py:49-77): stateful
    * conversation — append the user message to a rolling context,
    * evict the oldest non-system message while the context exceeds the
    * budget, emit the assistant reply with the request's timestamp and
    * append it to the context. The model call is injected (`reply`) —
    * a deterministic stub in tests, a real model handle in production
    * (the mapPartitions mount of MultimodalQueries m03). */
  final case class ChatState(messages: Vector[(String, String)])
  final class Chat(systemMsg: Option[String], contextBudget: Int,
      reply: Vector[(String, String)] => String) extends Machine[ChatState] {
    def init = ChatState(systemMsg.map("system" -> _).toVector)
    private val startIdx = if (systemMsg.isDefined) 1 else 0
    private def tokens(ms: Vector[(String, String)]): Int =
      ms.map(_._2.split("\\s+").length).sum
    def step(s: ChatState, e: Ev): (ChatState, Seq[Out]) = {
      if (e.paused || e.text == null) return (s, Nil)
      var ms = s.messages :+ ("user" -> e.text)
      // evict oldest non-system messages while over budget (keep the
      // newest user message, like the reference's pop-and-retry loop)
      while (tokens(ms) > contextBudget && ms.length > startIdx + 1)
        ms = ms.patch(startIdx, Nil, 1)
      val r = reply(ms)
      // value = the post-eviction context size (the reference's n_ctx
      // bookkeeping) so the eviction STATE is observable next to the
      // reply text — e40's oracle pins both channels.
      (ChatState(ms :+ ("assistant" -> r)),
        Seq(Out(e.ts, tokens(ms).toDouble, r)))
    }
  }

  // --------------------------------------------------------- synchronizer
  /** SequentialInTopicSynchronizer (client/topic.py:117-140), exact
    * dict semantics, as used by the synchronizer task
    * (synchronizer.py:14-35):
    *
    *  - `_topic_timestamps` holds only topics that have REGISTERED (a
    *    `wait_for` in flight or completed). A topic that never spoke —
    *    or whose pause popped it (:132) — does NOT constrain the min:
    *    the remaining topics flow without it. So the merged output is
    *    NOT globally ts-ordered when a late-starting topic joins with
    *    older timestamps; that is reference behavior, not a bug.
    *  - a message registers its ts, then releases once min over the
    *    dict ≥ its ts (:128-129); late messages (ts < the topic's LIVE
    *    dict entry, default 0 — a pause pop FORGETS progress and
    *    re-admits older ts) drop at wait_for time (:127).
    *  - a resume re-registers the topic at the current min (:134) so
    *    it rejoins without stalling anyone.
    *  - pause markers queue BEHIND pending data of their own topic
    *    (the per-topic receiver is sequential, topic.py:170-186): they
    *    take effect only when they reach the queue head.
    *
    * Canonical refinement of asyncio wake order: each step drains a
    * fixpoint — head markers/drops/registrations in ascending topic
    * order, then releases in ascending (ts, topic). Used as the
    * synchronizer operator (§2.1 #5); the runner pre-orders
    * multi-input operators with the same (ts, priority, seq) sort. */
  final case class SyncState(buf: Map[Int, Vector[Ev]],
      reg: Map[Int, Long], headReg: Set[Int])
  final class Synchronizer(topics: Int) extends Machine[SyncState]
      with Timed[SyncState] {
    override def arrivalOrder: Boolean = true
    def init = SyncState(
      (0 until topics).map(_ -> Vector.empty[Ev]).toMap, Map.empty, Set.empty)

    def step(s: SyncState, e: Ev): (SyncState, Seq[Out]) =
      drain(s.copy(buf = s.buf + (e.topic -> (s.buf(e.topic) :+ e))))

    private def drain(s0: SyncState): (SyncState, Seq[Out]) = {
      var buf = s0.buf
      var reg = s0.reg
      var headReg = s0.headReg
      val out = Vector.newBuilder[Out]
      var go = true
      while (go) {
        go = false
        // head markers, late drops, registrations (ascending topic)
        for (t <- 0 until topics if buf(t).nonEmpty && !headReg(t)) {
          val h = buf(t).head
          if (h.paused) { // set_paused (topic.py:132-134)
            if (pauseFlag(h)) reg -= t
            else reg += t -> (if (reg.isEmpty) 0L else reg.values.min)
            buf += t -> buf(t).tail; go = true
          } else if (h.ts < reg.getOrElse(t, 0L)) { // drop the past (:127)
            buf += t -> buf(t).tail; go = true
          } else { // wait_for registers (:128)
            reg += t -> h.ts; headReg += t; go = true
          }
        }
        // release the lowest-(ts, topic) registered head at the min
        val m = if (reg.isEmpty) 0L else reg.values.min
        val ready = (0 until topics).filter(t => headReg(t) && buf(t).head.ts <= m)
        if (ready.nonEmpty) {
          val t = ready.minBy(t => (buf(t).head.ts, t))
          val h = buf(t).head
          out += Out(h.ts, h.value, h.text)
          buf += t -> buf(t).tail; headReg -= t; go = true
        }
      }
      (SyncState(buf, reg, headReg), out.result())
    }

    /** End-of-input flush — batch convention (the reference would hold
      * blocked messages until more data arrives; a bounded batch has
      * none): per topic, apply the same late-drop rule down the
      * remaining queue, then merge in (ts, topic) order. */
    def onTimeout(s: SyncState): Seq[Out] =
      s.buf.toSeq.flatMap { case (t, es) =>
        var last = s.reg.getOrElse(t, 0L)
        es.flatMap { e =>
          // a BUFFERED pause marker applies its live effect: the pop
          // forgets the topic's progress (reg default 0), re-admitting
          // older timestamps exactly as a live drain would — the
          // marker itself is control, not output
          if (e.paused) { last = 0L; None }
          else if (e.ts < last) None
          else { last = e.ts; Some(t -> e) }
        }
      }
        .sortBy { case (t, e) => (e.ts, t) }
        .map { case (_, e) => Out(e.ts, e.value, e.text) }
  }

  // ---------------------------------------------------------- replay buffer
  /** `played` ≈ the reference's `play_task is not None`: at most one
    * replay per playing episode, reset when playing drops or the
    * buffer is cleared (`stop_play`). */
  final case class ReplayState(buf: Vector[Ev], lastPaused: Boolean,
      playing: Boolean, played: Boolean = false)

  /** Replay buffer (system/tasks/replaybuffer.py:28-92), as the
    * deterministic event-time machine the e16 window formulation pins:
    *
    *  - topic 0 (data): non-marker messages append to the buffer
    *    (run_input_receiver :38-48); an UNPAUSE transition (paused →
    *    resumed) clears it AND stops any play (:43-46 `buffer.clear()`
    *    + `stop_play()` — so a replay can fire again in the SAME
    *    playing episode once the buffer refills). Each append also
    *    re-checks the playing state (:48 `update_playing_state`): if
    *    the episode is live and has not yet replayed — the reference's
    *    `playing and play_task is None` (:79) — the arrival that makes
    *    the buffer non-empty STARTS the replay.
    *  - topic 1 (play): `playing := value > 0.5` (:52-57); INVALID
    *    play messages are skipped entirely (the ValidationError path,
    *    :58 — playing keeps its value). A rising value with an
    *    un-played episode and a non-empty buffer replays the whole
    *    buffer (:60-76): each buffered message re-emits at
    *    `ts + offset` where `offset = anchorTs − firstBufferedTs` —
    *    the reference computes `time_offset = sync.time − ts` of the
    *    first replayed packet, and `sync.time` is WALL-anchored
    *    (utils.py:299-303: get_timestamp_ms() + offset), so its
    *    event-time projection at the moment a replay starts is the
    *    TRIGGERING event's own timestamp: the play message's ts at an
    *    edge trigger, the arriving data's ts at an
    *    update_playing_state trigger (the same projection the volume
    *    meter's pause-zero uses). Replay does NOT consume the buffer,
    *    and `play_task` guards a second replay until the control
    *    drops (`stop_play`, :80-90) — then a later rise replays the
    *    same recording.
    *
    * The reference paces the replay against the wall clock
    * (asyncio.sleep, :72-73) and can loop; event time needs no pacing
    * — the re-stamped timestamps carry the schedule — and loop mode is
    * rejected at [[graft.plans.Pipeline.ReplayBufferOp]] build time. */
  final class ReplayBuffer extends Machine[ReplayState] {
    def init = ReplayState(Vector.empty, lastPaused = false, playing = false)
    // data before control at equal ts: a message landing exactly on the
    // play edge is part of the recording (the e16 window's sort order).
    override def priority(topic: Int): Int = if (topic == 0) 0 else 1

    private def replay(s: ReplayState, anchorTs: Long): Seq[Out] = {
      val off = anchorTs - s.buf.head.ts
      s.buf.map(b => Out(b.ts + off, b.value, b.text))
    }

    def step(s: ReplayState, e: Ev): (ReplayState, Seq[Out]) = e.topic match {
      case 0 =>
        if (e.paused) {
          val flag = pauseFlag(e)
          val cleared = s.lastPaused && !flag // unpause transition
          (s.copy(lastPaused = flag,
            buf = if (cleared) Vector.empty else s.buf,
            // stop_play (:44-46): the cleared episode may replay again
            played = if (cleared) false else s.played), Nil)
        } else {
          val s1 = s.copy(buf = s.buf :+ e)
          // update_playing_state on append (:48): a live, un-played
          // episode starts its replay on the arrival that fills the
          // buffer, anchored at that arrival (sync.time's event-time
          // projection — the wall clock at trigger)
          if (s1.playing && !s1.played)
            (s1.copy(played = true), replay(s1, e.ts))
          else (s1, Nil)
        }
      case _ =>
        if (e.paused || e.value.isNaN) (s, Nil) // control / ValidationError
        else {
          val sig = e.value > 0.5
          val s1 = s.copy(playing = sig,
            played = if (!sig) false else s.played) // stop_play on drop
          if (sig && !s1.played && s1.buf.nonEmpty)
            (s1.copy(played = true), replay(s1, e.ts))
          else (s1, Nil)
        }
    }
  }

  // ------------------------------------------- output-container synchronizer
  /** One muxed stream's timing config: `time_base = tbNum/tbDen` seconds
    * per dts tick, `frameAdv` ticks consumed per muxed packet (audio:
    * frame_size samples at tb 1/sample_rate; video: 1 frame at tb
    * 1/fps) — media/container.py:118-160 (`duration` setter quantizes
    * with `int(duration / time_base)`, `mux` advances `_dts_counter` by
    * frame_size / 1). `label` names the stream in emitted rows. */
  final case class OcStreamCfg(tbNum: Long, tbDen: Long, frameAdv: Long,
      label: String)

  final case class OcTopicState(
      queue: Vector[Ev], // pending items — data AND markers, arrival order
      headReg: Boolean, // head has entered wait_for (registered ts + dur)
      inReg: Boolean,   // topic present in topic_timestamps (not paused)
      regTs: Long,      // last registered timestamp
      c: Long)          // dts counter (duration = c * time_base)

  final case class OcState(started: Boolean, t0: Long,
      topics: Map[Int, OcTopicState])

  /** OutputContainerSynchronizer — the mux-sink bounded-desync algorithm
    * of system/tasks/media/outputcontainer.py:52-114 (`wait_for`
    * :70-101) + media/container.py:118-160, re-expressed as a
    * deterministic event-driven machine (SURVEY §2.3).
    *
    * Semantics: each stream's *duration* is its dts counter times its
    * time base — quantized per stream, advanced both by registration
    * (`max(c, floor((ts-t0)/tb))`, the `duration` setter) and by muxing
    * (`+= frameAdv`). Only a stream whose duration equals the minimum
    * duration may emit, and only within `maxDesync` ms of the minimum
    * registered timestamp; a stream stuck at the minimum timestamp but
    * not at minimum duration is *dropped* when the min-duration
    * streams' timestamps have run more than `maxDesync` ahead
    * (outputcontainer.py:85-91). Nothing emits before every stream has
    * registered one packet; t0 = min of those first timestamps (the
    * startup barrier, :73-75). A pause marker removes its topic from
    * the min computations (`set_paused`, :103-105) so a paused stream
    * cannot stall the container; its next data message re-registers.
    *
    * Determinism: the reference evaluates blocked `wait_for` coroutines
    * in asyncio wake order. This machine fixes a canonical refinement:
    * after each arrival it drains a fixpoint of actions in priority
    * order — register heads (ascending topic id), startup barrier, then
    * emits (ascending id), then drops (ascending id). Both the Spark
    * execution and the DuckDB oracle (ContainerQueries.e21) implement
    * exactly this order, so results are hash-comparable.
    *
    * Emits `Out(ts, dts, label)` — the packet's timestamp, its assigned
    * container dts, and the stream label. */
  final class OutputContainerSync(streams: Map[Int, OcStreamCfg],
      maxDesync: Long) extends Machine[OcState] {
    private val ids = streams.keys.toVector.sorted
    private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    /** Common duration unit so cross-stream comparisons are exact
      * integer math (no Fractions needed): lcm of time-base dens. */
    private val lcmDen = ids.map(streams(_).tbDen).reduce((a, b) => a / gcd(a, b) * b)
    private def durUnits(id: Int, c: Long): Long =
      c * streams(id).tbNum * (lcmDen / streams(id).tbDen)
    /** floor((durMs/1000) / time_base) — media/container.py:132. */
    private def quant(id: Int, durMs: Long): Long =
      Math.floorDiv(durMs * streams(id).tbDen, 1000L * streams(id).tbNum)

    def init = OcState(started = false, 0L,
      ids.map(_ -> OcTopicState(Vector.empty, false, false, 0L, 0L)).toMap)

    def step(s0: OcState, e: Ev): (OcState, Seq[Out]) = {
      if (!streams.contains(e.topic)) (s0, Nil) // wait_for line 71
      else
        // markers queue BEHIND the topic's pending packets — the
        // per-topic receiver is sequential (client/topic.py:170-186),
        // so set_paused takes effect only once the packets ahead of it
        // have completed their wait_for. (Applying markers out of band
        // could pop a topic from the dict while its head was blocked,
        // stranding that packet — caught by the exhaustive sim.)
        drain(s0.copy(topics = s0.topics +
          (e.topic -> s0.topics(e.topic).copy(
            queue = s0.topics(e.topic).queue :+ e))))
    }

    /** Fixpoint drain: apply the first applicable action until stuck. */
    private def drain(s0: OcState): (OcState, Seq[Out]) = {
      var s = s0
      val out = Vector.newBuilder[Out]
      var go = true
      while (go) {
        val regIds = ids.filter(s.topics(_).inReg)
        lazy val minDur = regIds.map(i => durUnits(i, s.topics(i).c)).min
        lazy val minTs = regIds.map(s.topics(_).regTs).min
        lazy val nextMinDurTs = regIds
          .filter(i => durUnits(i, s.topics(i).c) == minDur)
          .map(s.topics(_).regTs).min
        def canEmit(i: Int): Boolean = {
          val t = s.topics(i)
          t.headReg && durUnits(i, t.c) == minDur && t.regTs - maxDesync <= minTs
        }
        def canDrop(i: Int): Boolean = {
          val t = s.topics(i)
          t.headReg && t.regTs == minTs && durUnits(i, t.c) != minDur &&
            nextMinDurTs - maxDesync > t.regTs
        }
        // outputcontainer.py:94-96: streams absent from topic_timestamps
        // follow the emitting packet's duration so a paused stream can't
        // pin min_duration at a stale value.
        def dragPaused(ts: Long, st: OcState): OcState =
          st.copy(topics = st.topics.map { case (j, tj) =>
            if (tj.inReg) j -> tj
            else j -> tj.copy(c = math.max(tj.c, quant(j, ts - st.t0)))
          })
        ids.find(i => s.topics(i).queue.nonEmpty && !s.topics(i).headReg) match {
          case Some(i) =>
            val t = s.topics(i)
            val h = t.queue.head
            if (h.paused) {
              // set_paused (outputcontainer.py:103-105): pausing
              // removes the topic from the min computations; resuming
              // re-registers it at the current min timestamp
              // (topic.py:124 — min over the dict, 0 when empty)
              val t2 =
                if (pauseFlag(h)) t.copy(inReg = false, queue = t.queue.tail)
                else {
                  val regged = ids.filter(s.topics(_).inReg)
                  val mts =
                    if (regged.nonEmpty) regged.map(s.topics(_).regTs).min
                    else 0L
                  t.copy(inReg = true, regTs = mts, queue = t.queue.tail)
                }
              s = s.copy(topics = s.topics + (i -> t2))
            }
            else if (t.inReg && h.ts < t.regTs) // late packet → skip (line 71)
              s = s.copy(topics = s.topics + (i -> t.copy(queue = t.queue.tail)))
            else {
              val c2 = if (s.started) math.max(t.c, quant(i, h.ts - s.t0)) else t.c
              s = s.copy(topics = s.topics +
                (i -> t.copy(headReg = true, inReg = true, regTs = h.ts, c = c2)))
            }
          case None if !s.started && ids.forall(s.topics(_).headReg) =>
            val t0 = ids.map(s.topics(_).regTs).min // barrier release, :73-75
            s = s.copy(started = true, t0 = t0,
              topics = s.topics.map { case (j, tj) =>
                j -> tj.copy(c = math.max(tj.c, quant(j, tj.regTs - t0)))
              })
          case None if s.started && ids.exists(canEmit) =>
            val i = ids.find(canEmit).get
            val t = s.topics(i)
            out += Out(t.regTs, t.c.toDouble, streams(i).label)
            s = dragPaused(t.regTs, s.copy(topics = s.topics + (i -> t.copy(
              queue = t.queue.tail, headReg = false,
              c = t.c + streams(i).frameAdv))))
          case None if s.started && ids.exists(canDrop) =>
            val i = ids.find(canDrop).get
            val t = s.topics(i)
            s = dragPaused(t.regTs, s.copy(topics = s.topics + (i -> t.copy(
              queue = t.queue.tail, headReg = false))))
          case None => go = false
        }
      }
      (s, out.result())
    }
  }

  // ------------------------------------------------ video frame utilities
  /** Frames ride the envelope's `text` column as lowercase hex (the
    * engine-wide convention for binary payloads at the Op layer; the
    * query layer uses real BinaryType columns). */
  def hexDec(h: String): Array[Byte] = {
    val out = new Array[Byte](h.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((Character.digit(h.charAt(2 * i), 16) << 4)
        | Character.digit(h.charAt(2 * i + 1), 16)).toByte
      i += 1
    }
    out
  }
  private val HexDigits = "0123456789abcdef".toCharArray
  /** Payload validity — the duck-typing rule every reference task
    * applies (`except ValidationError: pass`, e.g.
    * audiovolumescaler.py:97, videomixer.py:111): a message whose
    * payload doesn't parse is SKIPPED, not an error. For frame
    * machines that means non-hex/odd/empty text; for sample machines
    * a NaN value. */
  def validHex(t: String): Boolean =
    t != null && t.nonEmpty && (t.length % 2 == 0) &&
      t.forall(c => Character.digit(c, 16) >= 0)

  def hexEnc(b: Array[Byte]): String = {
    // hot path (once per frame per video op): digit lookup, no
    // per-byte Formatter
    val out = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      val x = b(i) & 0xFF
      out(2 * i) = HexDigits(x >> 4); out(2 * i + 1) = HexDigits(x & 0xF)
      i += 1
    }
    new String(out)
  }

  // ---------------------------------------------- video activity meter
  /** videoactivitymeter.py:54-64: hold the previous frame, on each new
    * frame emit `np.abs(last_bitmap - bitmap).mean()` at the frame's
    * timestamp. The frames are uint8 ndarrays, so the subtraction
    * WRAPS modulo 256 before `np.abs` sees it (which is then the
    * identity on the non-negative wrapped values) — the machine
    * replicates that exact arithmetic, `mean((a − b) mod 256)`, not
    * the |a−b| a clean-room reading would guess (the p02 query keeps
    * the clean formulation; this is the reference-exact one). A pause
    * emits value 0 (the volume meter's rule, :46) and forwards the
    * transition; the held frame survives pauses (run_sync never
    * clears `last_bitmap`). */
  final case class AmState(prev: String, outPaused: Boolean)
  final class ActivityMeter extends Machine[AmState] {
    def init = AmState(null, outPaused = false)
    def step(s: AmState, e: Ev): (AmState, Seq[Out]) =
      if (e.paused) {
        val p = pauseFlag(e)
        val zero = if (p) Seq(Out(e.ts, 0.0, null)) else Nil
        val marker =
          if (p == s.outPaused) Nil
          else Seq(Out(e.ts, if (p) 1.0 else 0.0, null, paused = true))
        (s.copy(outPaused = p), zero ++ marker)
      } else if (!validHex(e.text)) (s, Nil) // invalid message: skipped
      else {
        val out =
          if (s.prev == null) Nil
          else {
            val a = hexDec(s.prev); val b = hexDec(e.text)
            require(a.length == b.length, "frame size changed mid-stream")
            var sum = 0L; var i = 0
            while (i < a.length) {
              sum += ((a(i) - b(i)) & 0xFF); i += 1 // uint8 wraparound
            }
            Seq(Out(e.ts, sum.toDouble / a.length, null))
          }
        (s.copy(prev = e.text), out)
      }
  }

  // ----------------------------------------------------------- video mixer
  /** videomixer.py:101-128: each track holds its last frame; a second
    * message on a track whose previous message was never blended
    * submits a mixing job FIRST (the `last_frame_count == frame_count`
    * check, :108-110), blending the last frames of every track that
    * has one (alpha composite in track order, the C++ `merge_images`
    * kernel — [[graft.functions.ImageKernel.mergeImages]]) at the MIN
    * of their timestamps (:117). A control message (pause OR resume)
    * clears that track's held frame (:107 — `track.last_message =
    * None` on any TopicControlData). No end-of-input flush: a frame
    * state never blended is dropped, as the reference's queue is. */
  final case class VmxState(lasts: Map[Int, (Long, String)],
      fc: Long, lfc: Map[Int, Long])
  final class VideoMixer(tracks: Int, alphaFront: Boolean = true)
      extends Machine[VmxState] {
    def init = VmxState(Map.empty, 0L,
      (0 until tracks).map(_ -> 0L).toMap)
    def step(s: VmxState, e: Ev): (VmxState, Seq[Out]) =
      if (e.paused) (s.copy(lasts = s.lasts - e.topic), Nil)
      else {
        val (s1, out) =
          if (s.lfc(e.topic) == s.fc && s.lasts.nonEmpty) {
            val ts = s.lasts.values.map(_._1).min
            val layers = (0 until tracks).flatMap(t =>
              s.lasts.get(t).map(f => hexDec(f._2)))
            val blended = graft.functions.ImageKernel
              .mergeImages(layers, alphaFront)
            (s.copy(fc = s.fc + 1), Seq(Out(ts, Double.NaN, hexEnc(blended))))
          } else if (s.lfc(e.topic) == s.fc) (s.copy(fc = s.fc + 1), Nil)
          else (s, Nil)
        // the reference validates AFTER the submit check
        // (videomixer.py:108-110): an invalid frame still submits a
        // pending mix but never becomes the track's held frame
        if (!validHex(e.text)) (s1, out)
        else (s1.copy(lasts = s1.lasts + (e.topic -> (e.ts, e.text)),
          lfc = s1.lfc + (e.topic -> s1.fc)), out)
      }
  }

  // ------------------------------------------------- delta-GOP video codec
  /** videoencoder.py / videodecoder.py re-expressed on the engine's
    * structural codec ([[graft.functions.Codec.Delta]], the m09 leg):
    * every `gop`-th frame is an I-frame (full payload), others are
    * P-frames (byte-wise delta vs the previous RECONSTRUCTED frame).
    * The encoder "ensures keyframe flags" (videoencoder.py) — emitted
    * text is `k|<hex>` or `p|<hex>`, the envelope's keyframe
    * convention (media switch reads the same flag). The decoder
    * inverts, emitting bare frame hex; a P-frame with no reference
    * errors loudly rather than decoding garbage. */
  final class DeltaEncoder(gop: Int) extends Machine[(Long, String)] {
    require(gop >= 1)
    def init = (0L, null)
    def step(s: (Long, String), e: Ev): ((Long, String), Seq[Out]) =
      if (e.paused) (s, Seq(Out(e.ts, e.value, null, paused = true)))
      else if (!validHex(e.text)) (s, Nil) // invalid message: skipped
      else {
        val (n, prev) = s
        val cur = hexDec(e.text)
        val (tag, payload) =
          if (n % gop == 0 || prev == null) ("k", cur)
          else ("p", graft.functions.Codec.Delta.encodeP(cur, hexDec(prev)))
        ((n + 1, e.text), Seq(Out(e.ts, e.value, s"$tag|${hexEnc(payload)}")))
      }
  }
  final class DeltaDecoder extends Machine[String] {
    def init = null
    def step(prev: String, e: Ev): (String, Seq[Out]) =
      if (e.paused) (prev, Seq(Out(e.ts, e.value, null, paused = true)))
      else if (e.text == null || e.text.length < 2 ||
          e.text.charAt(1) != '|' ||
          !validHex(e.text.substring(2))) (prev, Nil) // invalid: skipped
      else {
        val tag = e.text.charAt(0)
        val payload = hexDec(e.text.substring(2))
        val frame = tag match {
          case 'k' => payload
          case 'p' =>
            require(prev != null, "P-frame with no reference frame")
            graft.functions.Codec.Delta.decodeP(payload, hexDec(prev))
          case other => sys.error(s"unknown frame tag '$other'")
        }
        val hex = hexEnc(frame)
        (hex, Seq(Out(e.ts, e.value, hex)))
      }
  }

  // ------------------------------------------------------------ audio mixer
  /** audiomixer.py:76-120 on the one-sample-per-row envelope: each
    * track buffers its samples; `send_next` (:100-120) releases a
    * block only when every unpaused track's sequencer has started AND
    * can supply samples from `target_time = min(start_times)` — here,
    * when every unpaused started track has a buffered sample. The
    * released tick is the min head timestamp OVER THE UNPAUSED tracks;
    * the pop loop then runs over every STARTED track regardless of
    * pause (:109-114 `for track in self.audio_tracks: if
    * track.sequencer.started: pop_start(...)`) — so a track paused
    * with samples still buffered keeps CONTRIBUTING its aligned tail
    * to the mix (pre-target samples are silently consumed, the
    * `pop_start` discard; a later head gap-fills zero, util.py:228-257,
    * and keeps its sample). Pause itself does NOT clear the buffer:
    * the soft `reset()` after each round (:118) only clears a paused
    * track once its buffer has drained, and the HARD reset happens on
    * the unpause transition (`reset(True)`, :85-86) — so a resumed
    * track re-arms the startup barrier. A track that has never
    * produced blocks everything (the `not started` guard). */
  /** `clock` = the sequencer's buffer_start_time: the tick the
    * track's NEXT buffered sample aligns to, advanced by pops. It is
    * what lets a drained-AHEAD track keep releasing rounds (its
    * implicit zero-pad counts as available samples — the reference's
    * `get_max_samples` is positive when start_time > target). */
  final case class AmxTrack(queue: Vector[(Long, Double)], paused: Boolean,
      started: Boolean, clock: Long = 0L)
  final case class AmxState(tracks: Map[Int, AmxTrack])
  final class AudioMixer(n: Int) extends Machine[AmxState] {
    require(n >= 1)
    def init = AmxState((0 until n)
      .map(_ -> AmxTrack(Vector.empty, paused = false, started = false))
      .toMap)
    def step(s: AmxState, e: Ev): (AmxState, Seq[Out]) = {
      val t0 = s.tracks(e.topic)
      val s1 =
        if (e.paused) {
          val flag = pauseFlag(e)
          // HARD reset only on the unpause transition (:85-86); the
          // pause itself keeps the buffer (it drains into later mixes)
          val cleared = t0.paused && !flag
          s.copy(tracks = s.tracks + (e.topic -> t0.copy(
            queue = if (cleared) Vector.empty else t0.queue,
            started = if (cleared) false else t0.started,
            paused = flag)))
        }
        else if (e.value.isNaN) s // invalid message: skipped
        else
          s.copy(tracks = s.tracks + (e.topic -> t0.copy(
            queue = t0.queue :+ (e.ts, e.value), started = true,
            clock = if (t0.started) t0.clock else e.ts)))
      drain(s1)
    }
    private def drain(s0: AmxState): (AmxState, Seq[Out]) = {
      var s = s0
      val out = Vector.newBuilder[Out]
      var go = true
      while (go) {
        val active = s.tracks.filter(!_._2.paused)
        val ready = active.nonEmpty && active.valuesIterator.forall(_.started)
        if (!ready) go = false
        else {
          // target = min unpaused start_time; a round fires while every
          // unpaused track can supply a sample FROM target — buffered
          // or the implicit zero-pad of a drained-ahead clock
          // (get_max_samples, util.py:213)
          val t = active.valuesIterator.map(_.clock).min
          // buffer length counts the ts-SPAN, not the row count: a
          // within-track gap is a zero the reference inserted at
          // insert time (AudioSequencer desync fill, util.py:240-257),
          // so it both counts as available and mixes as silence
          def span(tr: AmxTrack): Long =
            if (tr.queue.isEmpty) 0L else tr.queue.last._1 - tr.clock + 1
          val num = active.valuesIterator
            .map(tr => tr.clock + span(tr) - t).min
          if (num <= 0) go = false
          else {
            var sum = 0.0
            val upd = s.tracks.map { case (i, tr) =>
              if (tr.started) {
                if (tr.clock > t)
                  i -> tr // started later than target: zero-pad, keep all
                else {
                  // pop_start(target, 1): consume through the target —
                  // pre-target samples of a behind (paused) track are
                  // silently discarded; the aligned sample contributes
                  // (a gap tick contributes its insert-time zero)
                  val bufEnd = math.min(t - tr.clock + 1, span(tr))
                  val consumed = tr.queue.takeWhile(_._1 <= t)
                  consumed.lastOption.filter(_._1 == t)
                    .foreach(sum += _._2)
                  val q2 = tr.queue.drop(consumed.length)
                  // soft reset after the round (:118): a paused track
                  // whose buffer has drained resets to not-started
                  i -> tr.copy(queue = q2,
                    clock = tr.clock + math.max(0L, bufEnd),
                    started = !(tr.paused && q2.isEmpty))
                }
              } else i -> tr
            }
            out += Out(t, sum, null)
            s = AmxState(upd)
          }
        }
      }
      (s, out.result())
    }
  }

  // ----------------------------------------------- audio stream codecs
  /** audioencoder.py / audiodecoder.py on the engine's structural
    * audio codecs. μ-law is per-sample stateless
    * ([[graft.functions.Codec.MuLaw]], the p07 leg) and compiles to a
    * plain projection; IMA-ADPCM carries the (predictor, step index)
    * pair across samples ([[graft.functions.Codec.ImaAdpcm]], the p10
    * leg) — these machines are that state. A pause resets the
    * predictor chain (a new segment decodes from scratch, the
    * reference's t0-anchor reset on control, audiodecoder.py:36-44). */
  final class AdpcmEncoder extends Machine[(Int, Int)] {
    def init = (0, 0)
    def step(s: (Int, Int), e: Ev): ((Int, Int), Seq[Out]) =
      if (e.paused) ((0, 0), Seq(Out(e.ts, e.value, null, paused = true)))
      else if (e.value.isNaN) (s, Nil) // invalid message: skipped
      else {
        val (nib, p2, i2) = graft.functions.Codec.ImaAdpcm
          .encodeStep(e.value.toInt, s._1, s._2)
        ((p2, i2), Seq(Out(e.ts, nib.toDouble, e.text)))
      }
  }
  final class AdpcmDecoder extends Machine[(Int, Int)] {
    def init = (0, 0)
    def step(s: (Int, Int), e: Ev): ((Int, Int), Seq[Out]) =
      if (e.paused) ((0, 0), Seq(Out(e.ts, e.value, null, paused = true)))
      else if (e.value.isNaN) (s, Nil) // invalid message: skipped
      else {
        val (sample, p2, i2) = graft.functions.Codec.ImaAdpcm
          .decodeStep(e.value.toInt, s._1, s._2)
        ((p2, i2), Seq(Out(e.ts, sample.toDouble, e.text)))
      }
  }

  // -------------------------------------------------------- audio resampler
  /** audioresampler.py:22-52 restricted to the engine's rational
    * grid: integer DECIMATION when in_rate = k·out_rate (keep every
    * k-th sample at its own timestamp) and integer REPETITION when
    * out_rate = r·in_rate (each sample emitted r times at
    * 1000/out_rate ms steps — nearest-neighbour hold, libav's
    * zero-order leg). The libav polyphase filter bank stays at the
    * media edge; the rate/timestamp arithmetic is what the engine
    * owns. A pause resets the decimation phase (the t0 re-anchor,
    * audioresampler.py:38). */
  final class Resampler(inRate: Long, outRate: Long) extends Machine[Long] {
    require(inRate > 0 && outRate > 0 &&
      (inRate % outRate == 0 || outRate % inRate == 0),
      s"only rational decimation/repetition: $inRate → $outRate")
    private val down = inRate / outRate       // ≥1 when decimating
    private val up = outRate / inRate         // ≥1 when repeating
    require(up == 1 || 1000 % outRate == 0,
      s"repetition needs an integer ms step: 1000/$outRate")
    def init = 0L
    def step(i: Long, e: Ev): (Long, Seq[Out]) =
      if (e.paused) (0L, Seq(Out(e.ts, e.value, null, paused = true)))
      else if (e.value.isNaN) (i, Nil) // invalid message: skipped
      else if (down > 1)
        (i + 1, if (i % down == 0) Seq(Out(e.ts, e.value, e.text)) else Nil)
      else
        (i + 1, (0L until up).map(j =>
          Out(e.ts + j * (1000 / outRate), e.value, e.text)))
  }

  // -------------------------------------------------- ASR chunked decode
  /** asrspeechrecognition.py:54-71: fixed-size chunking of the sample
    * stream, model inference per chunk, incremental transcript
    * emission. The engine's model is the TRAINED integer softmax head
    * [[graft.functions.AsrTiny]] (m15's weights, loaded once per JVM
    * from the jar — the speechbrain checkpoint binding point); each
    * `dim`-sample chunk becomes one feature frame, the greedy argmax
    * symbol passes the CTC collapse (emit only when it differs from
    * the previous prediction and is not the blank — m07/m15's rule),
    * and the emitted message carries the symbol (text AND value, so
    * downstream text ops and number ops can both consume it). A pause
    * resets the utterance (buffer + collapse state). */
  final class AsrChunked(dim: Int) extends Machine[(Vector[Long], Int)] {
    require(dim >= 1)
    def init = (Vector.empty, 0)
    def step(s: (Vector[Long], Int), e: Ev)
        : ((Vector[Long], Int), Seq[Out]) =
      if (e.paused) (init, Seq(Out(e.ts, e.value, null, paused = true)))
      else if (e.value.isNaN) (s, Nil) // invalid message: skipped
      else {
        val buf = s._1 :+ math.round(e.value)
        if (buf.size < dim) ((buf, s._2), Nil)
        else {
          val sym = graft.functions.AsrTiny.model.predict(buf.toArray)
          val out =
            if (sym != s._2 && sym != 0)
              Seq(Out(e.ts, sym.toDouble, sym.toString))
            else Nil
          ((Vector.empty, sym), out)
        }
      }
  }

  // ------------------------------------------- TTS length regulator synth
  /** fastspeech2tts.py:56-77 on the engine's structural chain (m08's
    * length regulator + m29's envelope synth): each text message
    * expands to `samplesPerChar` PCM samples per character — the
    * FastSpeech2 duration-regulated upsampling — on a 1 ms grid from
    * the message timestamp. The synthesized sample is a deterministic
    * integer envelope, amp(c)·tri(j) with amp = (c mod 16) + 1 and an
    * 8-step triangle — the shape m29's trained duration head drives;
    * the speechbrain vocoder binds at this seam in production. */
  final class TtsSynth(samplesPerChar: Int) extends Machine[Unit] {
    require(samplesPerChar >= 1)
    def init: Unit = ()
    def step(s: Unit, e: Ev): (Unit, Seq[Out]) =
      if (e.paused) ((), Seq(Out(e.ts, e.value, null, paused = true)))
      else {
        val text = if (e.text == null) "" else e.text
        val outs = for {
          (c, ci) <- text.zipWithIndex
          j <- 0 until samplesPerChar
        } yield {
          val amp = (c.toInt % 16) + 1
          val tri = if (j % 8 < 4) j % 8 else 8 - j % 8
          Out(e.ts + (ci.toLong * samplesPerChar + j),
            (amp * tri).toDouble, null)
        }
        ((), outs)
      }
  }

  // --------------------------------------------------- audio volume scaler
  /** audiovolumescaler.py:68-97: multiply each sample by the LAST
    * received scale value, clip to the dtype range, truncate toward
    * zero (numpy `.astype` on the clipped float — :78). Topic 0 =
    * audio (one sample per envelope row, the exploded
    * TimestampChuckMessage), topic 1 = scale. Scale handling
    * (`_run_recv_scale`, :82-90): a PAUSE resets scale to the default,
    * an invalid message (NaN) resets to the default, a valid
    * NumberMessage sets it; none of these emit. Audio handling
    * (`_run_recv_audio`, :92-97): pause markers forward to the output
    * (`set_paused`), data emits the scaled sample at its own
    * timestamp. The reference synchronizes both inputs with the plain
    * (arrival-tie) SequentialInTopicSynchronizer; the engine pins the
    * deterministic control-first tie-break at equal timestamps, the
    * same choice the gate's prioritized synchronizer makes
    * (gate.py:52-54). */
  final case class VsState(scale: Double, outPaused: Boolean)
  final class VolumeScaler(defaultScale: Double, lo: Double, hi: Double)
      extends Machine[VsState] {
    def init = VsState(defaultScale, outPaused = false)
    override def priority(topic: Int): Int = if (topic == 1) 0 else 1
    def step(s: VsState, e: Ev): (VsState, Seq[Out]) = e.topic match {
      case 1 =>
        val s1 =
          if (e.paused) { if (pauseFlag(e)) s.copy(scale = defaultScale) else s }
          else if (e.value.isNaN) s.copy(scale = defaultScale)
          else s.copy(scale = e.value)
        (s1, Nil)
      case _ =>
        if (e.paused) {
          val p = pauseFlag(e)
          if (p == s.outPaused) (s, Nil)
          else (s.copy(outPaused = p),
            Seq(Out(e.ts, if (p) 1.0 else 0.0, null, paused = true)))
        } else if (e.value.isNaN) (s, Nil) // invalid message: skipped
        else {
          // np.clip(x * scale, lo, hi).astype(int): truncation toward
          // zero, exactly Double→Long narrowing
          val y = math.max(lo, math.min(hi, e.value * s.scale)).toLong
          (s, Seq(Out(e.ts, y.toDouble, e.text)))
        }
    }
  }

  // ---------------------------------------------------- audio volume meter
  /** audiovolumemeter.py:61-74 + AudioChunker (media/util.py:131-148):
    * re-chunk the sample stream into `chunkSize`-sample blocks and per
    * block emit `sqrt(mean(|x| / maxValue))` — the reference's
    * loudness measure (:68). Chunker semantics replicated exactly:
    *  - a block is released only when the buffer EXCEEDS chunk_size
    *    (`while size > chunk_size`, util.py:145) — a partial tail, and
    *    even an exactly-full block with no successor sample, never
    *    emits;
    *  - the block timestamp is `msg.ts − size_before·1000 // rate`
    *    (util.py:142), i.e. the arriving sample's time projected back
    *    to the block head.
    * With one sample per envelope row the buffer grows by one per
    * event, so at most one block releases per event and the carried
    * state is just (count, Σ|x|) — the sum is exact for integer
    * sample values, which keeps `sqrt((Σ|x|/max)/n)` reproducible by
    * the SQL oracle. A pause emits value 0 at the marker's event time
    * (the deterministic projection of `sync.time`, :55) and forwards
    * the pause transition. */
  final case class VmState(n: Long, sumAbs: Double, outPaused: Boolean)
  final class VolumeMeter(chunkSize: Int, rateHz: Long, maxValue: Double)
      extends Machine[VmState] {
    require(chunkSize > 0 && rateHz > 0)
    def init = VmState(0L, 0.0, outPaused = false)
    def step(s: VmState, e: Ev): (VmState, Seq[Out]) =
      if (e.paused) {
        val p = pauseFlag(e)
        val zero = if (p) Seq(Out(e.ts, 0.0, null)) else Nil
        val marker =
          if (p == s.outPaused) Nil
          else Seq(Out(e.ts, if (p) 1.0 else 0.0, null, paused = true))
        (s.copy(outPaused = p), zero ++ marker)
      } else if (e.value.isNaN) (s, Nil) // invalid message: skipped
      else if (s.n >= chunkSize) {
        // buffer exceeds chunk_size with this sample appended: release
        // the accumulated block (the new sample starts the next one)
        val blockTs = e.ts - s.n * 1000L / rateHz
        val v = math.sqrt(s.sumAbs / maxValue / s.n)
        (s.copy(n = 1L, sumAbs = math.abs(e.value)), Seq(Out(blockTs, v, null)))
      } else
        (s.copy(n = s.n + 1L, sumAbs = s.sumAbs + math.abs(e.value)), Nil)
  }
}

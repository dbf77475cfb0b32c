package graft.streaming

import graft.streaming.StateMachines._
import graft.streaming.StatefulRunner.{KEv, KOut}
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Mounts a pure [[StateMachines.Machine]] on `transformWithState`
  * (Spark 4.x `StatefulProcessor`) — the modern twin of
  * [[StatefulRunner.runStreaming]]'s `flatMapGroupsWithState` mount,
  * with identical per-key semantics:
  *
  *  - each micro-batch's rows fold in (ts, priority, seq) order — the
  *    order the reference's PrioritizedSequentialInTopicSynchronizer
  *    establishes (/root/reference/streamtasks/client/topic.py:142-165)
  *    — or in bare arrival (`seq`) order for machines declaring
  *    [[StateMachines.Machine.arrivalOrder]], same as the fMGWS mount;
  *  - the machine state lives in a named `ValueState` (one state-store
  *    entry per pipeline key, RocksDB-capable — transformWithState
  *    requires the RocksDB provider, which IS the scale-path config);
  *  - a [[StateMachines.Timed]] machine arms a processing-time TIMER
  *    re-registered on every batch with data; expiry runs `onTimeout`
  *    and drops the state (`removeOnTimeout`) or re-arms (repeater) —
  *    exactly the `GroupStateTimeout.ProcessingTimeTimeout` path.
  *
  * Why both mounts exist: fMGWS is the stable API the whole streaming
  * surface runs on today; transformWithState adds composable typed
  * state (value/list/map), per-key timers, and state-schema evolution,
  * and is where new Spark state features land. Keeping the machine pure
  * makes the two mounts provably interchangeable (StreamingE2ESpec
  * pins cross-mount equality on the detector, the timeout canonical).
  */
object TwsRunner {

  private final class MachineProcessor[S: scala.reflect.ClassTag](
      machine: Machine[S], timeoutMs: Long)
      extends StatefulProcessor[String, KEv, KOut] {
    @transient private var state: ValueState[S] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[S]("machine", Encoders.kryo[S],
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[KEv],
        tv: TimerValues): Iterator[KOut] = {
      val s0 = if (state.exists) state.get else machine.init
      val es =
        if (machine.arrivalOrder) rows.toVector.sortBy(_.seq)
        else rows.toVector.sortBy(e => (e.ts, machine.priority(e.topic), e.seq))
      val (s, outs) = es.foldLeft((s0, Vector.empty[KOut])) {
        case ((s1, acc), e) =>
          val (s2, os) =
            machine.step(s1, Ev(e.topic, e.ts, e.value, e.text, e.paused))
          (s2, acc ++ os.map(o => KOut(key, o.ts, o.value, o.text, o.paused)))
      }
      state.update(s)
      if (timeoutMs > 0) {
        // registerTimer ADDS a timer (unlike setTimeoutDuration, which
        // replaces) — drop the stale ones so expiry fires exactly once
        // per idle gap
        getHandle.listTimers()
          .foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer(tv.getCurrentProcessingTimeInMs + timeoutMs)
      }
      outs.iterator
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[KOut] = {
      val tail = machine match {
        case t: Timed[S @unchecked] if state.exists => t.onTimeout(state.get)
        case _ => Nil
      }
      machine match {
        case t: Timed[_] if !t.removeOnTimeout && timeoutMs > 0 =>
          getHandle.registerTimer(tv.getCurrentProcessingTimeInMs + timeoutMs)
        case _ => state.clear()
      }
      tail.iterator.map(o => KOut(key, o.ts, o.value, o.text, o.paused))
    }
  }

  /** Streaming execution via transformWithState. Needs
    * `spark.sql.streaming.stateStore.providerClass` =
    * RocksDBStateStoreProvider (a transformWithState requirement — and
    * the production configuration anyway). */
  def runStreaming[S: scala.reflect.ClassTag](machine: Machine[S], ds: Dataset[KEv],
      timeoutMs: Long = 0L): Dataset[KOut] = {
    implicit val strEnc: Encoder[String] = Encoders.STRING
    implicit val koutEnc: Encoder[KOut] = StatefulRunner.koutEnc
    // ProcessingTime keeps the micro-batch loop ticking to evaluate
    // timers (so processAllAvailable never settles) — request it only
    // when the machine actually needs timers
    val timeMode =
      if (timeoutMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    ds.groupByKey(_.key).transformWithState(
      new MachineProcessor(machine, timeoutMs),
      timeMode, OutputMode.Append())
  }
}

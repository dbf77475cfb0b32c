package graft.streaming

import graft.streaming.StateMachines._
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Mounts a pure [[StateMachines.Machine]] on Spark, in both execution
  * modes:
  *
  *  - '''streaming''': `flatMapGroupsWithState` over a keyed stream —
  *    the reference's one-state-object-per-task model
  *    (/root/reference/streamtasks/system/task.py:28-34) becomes one
  *    state-store entry per pipeline key, distributed across
  *    executors and checkpointed (RocksDB-capable) instead of held in
  *    a Python object;
  *  - '''batch''': `flatMapGroups` with identical per-key semantics —
  *    used for oracle-checked equivalence tests and backfills.
  *
  * Ordering: the reference guarantees per-operator total order via its
  * synchronizer (client/topic.py:117-165). Micro-batches don't, so the
  * runner sorts each group's batch by (ts, priority, seq) before
  * folding — equal semantics within a batch; across batches events are
  * assumed watermark-ordered (late data handling is each machine's
  * documented rule, e.g. the synchronizer's drop).
  *
  * Scale: state is keyed by `key` (pipeline instance). A deployment
  * with millions of independent pipelines (e.g. per-device gates)
  * spreads over all executors; each group's fold is O(batch rows) with
  * O(1)–O(buffer) state.
  */
object StatefulRunner {

  /** A keyed event row: `key` selects the operator instance. */
  final case class KEv(key: String, topic: Int, ts: Long, value: Double,
      text: String, paused: Boolean, seq: Long)

  final case class KOut(key: String, ts: Long, value: Double, text: String,
      paused: Boolean = false)

  implicit val kevEnc: Encoder[KEv] = Encoders.product[KEv]
  implicit val koutEnc: Encoder[KOut] = Encoders.product[KOut]
  implicit val strEnc: Encoder[String] = Encoders.STRING

  private def sorted[S](m: Machine[S], es: Iterator[KEv]): Seq[KEv] =
    if (m.arrivalOrder) es.toVector.sortBy(_.seq)
    else es.toVector.sortBy(e => (e.ts, m.priority(e.topic), e.seq))

  private def fold[S](m: Machine[S], key: String, s0: S, es: Seq[KEv]): (S, Seq[KOut]) =
    es.foldLeft((s0, Vector.empty[KOut])) { case ((s, acc), e) =>
      val (s2, outs) = m.step(s, Ev(e.topic, e.ts, e.value, e.text, e.paused))
      (s2, acc ++ outs.map(o => KOut(key, o.ts, o.value, o.text, o.paused)))
    }

  /** Batch execution: group by key, fold in order, append the
    * machine's end-of-input emissions (detector trailing 0,
    * synchronizer flush). */
  def runBatch[S](machine: Machine[S], ds: Dataset[KEv]): Dataset[KOut] = {
    ds.groupByKey(_.key)
      .flatMapGroups { (key: String, es: Iterator[KEv]) =>
        val (s, outs) = fold(machine, key, machine.init, sorted(machine, es))
        val tail = machine match {
          case t: Timed[S @unchecked] => t.onTimeout(s)
          case _ => Nil
        }
        (outs ++ tail.map(o => KOut(key, o.ts, o.value, o.text, o.paused))).iterator
      }
  }

  /** Streaming execution: flatMapGroupsWithState in append mode with a
    * processing-time timeout for emit-without-input machines
    * (detector; SURVEY §7.4 "emit-without-input"). */
  def runStreaming[S](machine: Machine[S], ds: Dataset[KEv],
      timeoutMs: Long = 0L): Dataset[KOut] = {
    implicit val se: Encoder[Option[S]] = Encoders.kryo[Option[S]]
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Option[S], KOut](
        OutputMode.Append(), timeoutConf) {
        (key: String, es: Iterator[KEv], gs: GroupState[Option[S]]) =>
          if (gs.hasTimedOut) {
            val tail = (machine, gs.getOption.flatten) match {
              case (t: Timed[S @unchecked], Some(s)) => t.onTimeout(s)
              case _ => Nil
            }
            machine match {
              case t: Timed[_] if !t.removeOnTimeout && timeoutMs > 0 =>
                gs.setTimeoutDuration(timeoutMs) // repeater: keep ticking
              case _ => gs.remove()
            }
            tail.map(o => KOut(key, o.ts, o.value, o.text, o.paused)).iterator
          } else {
            val s0 = gs.getOption.flatten.getOrElse(machine.init)
            val (s, outs) = fold(machine, key, s0, sorted(machine, es))
            gs.update(Some(s))
            if (timeoutMs > 0) gs.setTimeoutDuration(timeoutMs)
            outs.iterator
          }
      }
  }

  /** Streaming execution on EVENT-TIME timers: the machine's
    * emit-without-input path (detector trailing 0,
    * messagedetector.py:30-88) driven by the WATERMARK instead of the
    * wall clock — the semantics the reference's event-time mode
    * actually specifies. `deadline(state)` names the event-time
    * instant the machine wants to wake at; when the watermark passes
    * it with no new data for the key, `onTimeout` fires and the state
    * retires. A deadline already behind the watermark is clamped to
    * watermark+1 — the wake is late (it fires next batch) but the
    * machine's OUTPUT timestamps come from its own state, so the
    * emitted rows are identical; if data for the key lands first the
    * fold handles the gap itself and the timer never fires (per-batch,
    * keys with data never time out).
    *
    * Scale: identical distribution story to [[runStreaming]] — one
    * state-store entry per key, RocksDB-capable — plus the timer
    * registry the state store already maintains; no extra shuffle. */
  def runStreamingEventTime[S](machine: Machine[S] with Timed[S],
      ds: Dataset[KEv], deadline: S => Option[Long]): Dataset[KOut] = {
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    implicit val se: Encoder[Option[S]] = Encoders.kryo[Option[S]]
    val wm = ds.withColumn("eventTime", timestamp_millis(col("ts")))
      .withWatermark("eventTime", "0 milliseconds")
      .as[KEv](kevEnc)
    wm.groupByKey(_.key)
      .flatMapGroupsWithState[Option[S], KOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, es: Iterator[KEv], gs: GroupState[Option[S]]) =>
          if (gs.hasTimedOut) {
            val tail = gs.getOption.flatten.map(machine.onTimeout)
              .getOrElse(Nil)
            gs.remove()
            tail.map(o => KOut(key, o.ts, o.value, o.text, o.paused)).iterator
          } else {
            val s0 = gs.getOption.flatten.getOrElse(machine.init)
            val (s, outs) = fold(machine, key, s0, sorted(machine, es))
            gs.update(Some(s))
            deadline(s).foreach { d =>
              gs.setTimeoutTimestamp(math.max(d, gs.getCurrentWatermarkMs + 1))
            }
            outs.iterator
          }
      }
  }
}

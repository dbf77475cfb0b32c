package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import StatefulRunner.{KEv, KOut, koutEnc, strEnc}

/** Streaming cardinality — the online form of the batch HLL sketch
  * (operators/SketchQueries k02): events arrive on an unbounded
  * stream, each carries its precomputed (bucket, rank) register
  * coordinates (pure per-row expressions on the batch side of the
  * mount, same md5-derived family as k02), and a per-key state cell
  * holds the 256-register array. Register merge is max — commutative,
  * associative, idempotent — so the final state is independent of how
  * the stream was chunked into micro-batches: THE mergeable-sketch
  * property, demonstrated across real micro-batch boundaries instead
  * of claimed.
  *
  * Each batch emits the key's running totals (events seen, registers
  * hit, register sum) plus the running estimate; the registered query
  * keeps only the final row per key, whose integer register state is
  * what the DuckDB oracle hash-checks (the estimate's small-range
  * branch is ln()-based, and libm ulp parity across engines is not a
  * promise the gate should rest on — SketchSpec pins the estimate
  * JVM-side instead).
  *
  * Scale: state is one 256-int array + a counter per key — O(m) per
  * distinct stream key, RocksDB-capable, watermark-free (the sketch
  * never grows); this is the shape of every production streaming
  * distinct-count (Dataflow/Flink HLL accumulators).
  */
object StreamingSketch {

  final case class HllSt(regs: Array[Int], n: Long)
  implicit val hllStEnc: Encoder[HllSt] = Encoders.product[HllSt]

  private val M = 256

  /** (registers hit, Σ 2^(33-r) over all m registers incl. empties). */
  def registerStats(regs: Array[Int]): (Long, Long) = {
    var hit = 0L; var s = 0L; var i = 0
    while (i < M) {
      if (regs(i) > 0) hit += 1
      s += 1L << (33 - regs(i))
      i += 1
    }
    (hit, s)
  }

  /** Same estimate arithmetic as k02 (identical literals), with the
    * small-range linear-counting branch of Flajolet et al. */
  def estimate(regs: Array[Int]): Double = {
    val (hit, s) = registerStats(regs)
    val raw = (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 8589934592.0 /
      s.toDouble
    val zeros = M - hit
    if (raw <= 640.0 && zeros > 0) 256.0 * math.log(256.0 / zeros.toDouble)
    else raw
  }

  /** Mount on a streaming KEv frame where topic = register bucket and
    * value = register rank: per micro-batch, merges the batch's rows
    * into the per-key register state and emits the running totals —
    * KOut(key, ts = events seen, value = running estimate,
    * text = "registersHit,registerSum"). */
  def hllStream(ds: Dataset[KEv]): Dataset[KOut] = {
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[HllSt, KOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, evs: Iterator[KEv], gs: GroupState[HllSt]) =>
          val st = gs.getOption.getOrElse(HllSt(new Array[Int](M), 0L))
          val regs = st.regs.clone()
          var n = st.n
          evs.foreach { e =>
            val b = e.topic; val r = e.value.toInt
            if (r > regs(b)) regs(b) = r
            n += 1
          }
          gs.update(HllSt(regs, n))
          val (hit, s) = registerStats(regs)
          Iterator(KOut(key, n, estimate(regs), s"$hit,$s"))
      }
  }
}

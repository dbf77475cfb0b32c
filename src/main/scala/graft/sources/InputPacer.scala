package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Input-container demux-source timing
  * (/root/reference/streamtasks/system/tasks/media/inputcontainer.py:63-83
  * + media/container.py:81-88): a container's packets carry stream-local
  * dts in stream time-base ticks; the source restamps them onto a
  * shared timeline anchored at start (`t0 = anchor − first offset`,
  * `ts = t0 + floor(dts · tb · 1000)`) and, in real-time mode, paces
  * emission so a packet is sent no earlier than its restamped time.
  *
  * Spark-first shapes:
  *  - [[restamp]] — the pure timing computation as window expressions
  *    (no state, fully codegen'd); used by the m04 oracle query.
  *  - [[paced]] — real-time pacing WITHOUT a custom source: a `rate`
  *    stream is the clock; each tick equality-joins (broadcast, no
  *    shuffle, no state) against the static packet table bucketed by
  *    `ceil(offset / tickMs)`, releasing exactly the packets due in
  *    that tick. The reference's accumulated-lag compensation
  *    (inputcontainer.py:80-82) is subsumed: a late micro-batch's
  *    bucket still selects its packets, so the stream catches up
  *    instead of drifting.
  *
  * Scale: one rate row per tick; the packet side is static and
  * broadcast once per batch. A deployment with many containers keys
  * the join by (container, bucket) — ticks fan out via the broadcast,
  * so adding containers adds no shuffle.
  */
object InputPacer {

  /** Stream-local dts → container-relative offset ms:
    * `convert_position(dts, 1/1000)` = floor(dts · tbNum · 1000 / tbDen)
    * (media/container.py:81). */
  def offsetMs(dts: Column, tbNum: Column, tbDen: Column): Column =
    floor(dts * tbNum * lit(1000) / tbDen).cast("long")

  /** Restamp packets onto the anchored timeline. Input columns:
    * `container` (grouping key), `stream`, `dts`, `tb_num`, `tb_den`.
    * Adds `offset_ms` and `ts = anchor − min(offset) + offset` — the
    * reference's `t0 = now − first offset_timestamp`
    * (inputcontainer.py:74-77) with the wall clock replaced by an
    * explicit anchor so batch runs are deterministic. */
  def restamp(packets: DataFrame, anchorMs: Long): DataFrame = {
    val w = Window.partitionBy(col("container"))
    packets
      .withColumn("offset_ms",
        offsetMs(col("dts"), col("tb_num"), col("tb_den")))
      .withColumn("ts",
        lit(anchorMs) - min(col("offset_ms")).over(w) + col("offset_ms"))
  }

  /** Real-time paced emission: `rate` ticks every `tickMs` join the
    * restamped packets on `bucket = ceil(offset/tickMs)`, so packet
    * with offset o is released on the first tick at or after o. The
    * static side is broadcast; the stream side holds no state. */
  def paced(spark: SparkSession, packets: DataFrame, anchorMs: Long,
      tickMs: Long): DataFrame = {
    val stamped = restamp(packets, anchorMs)
      .withColumn("rel_ms", col("offset_ms") -
        min(col("offset_ms")).over(Window.partitionBy(col("container"))))
      // exact integer ceil: first tick at or after the packet's due time
      .withColumn("bucket", expr(s"(rel_ms + ${tickMs - 1}) div $tickMs"))
    val ticks = spark.readStream
      .format("rate")
      .option("rowsPerSecond", (1000.0 / tickMs).max(1.0).toInt)
      .load()
      .select(col("value").as("bucket"), col("timestamp").as("tick_wall"))
    ticks.join(broadcast(stamped), Seq("bucket"))
      .select(col("container"), col("stream"), col("dts"), col("offset_ms"),
        col("ts"), col("bucket"), col("tick_wall"))
  }
}

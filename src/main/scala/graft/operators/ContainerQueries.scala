package graft.operators

import graft.Q
import graft.Tables.eventsMs
import graft.streaming.StatefulRunner
import graft.streaming.StateMachines._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Media-container operators (SURVEY §2.2 #29/#30) — the mux-sink
  * bounded-desync synchronizer and (see InputPacer) the demux-source
  * timing, exercised as driver-verifiable queries over the events
  * table.
  *
  * e21 runs the [[OutputContainerSync]] machine through
  * [[StatefulRunner.runBatch]] — `flatMapGroups` keyed by pipeline, the
  * distributed shape: one container instance per key, millions of keys
  * spread over executors, state O(queued packets) per key. The DuckDB
  * oracle is an independent implementation of the same deterministic
  * action system as a recursive CTE, so the driver hash-checks the full
  * emit/drop/dts trace, not just row counts.
  */
object ContainerQueries {

  /** Two streams per pipeline: clicks as an audio-like stream
    * (time_base 1/32000 s, 1024-sample frames → 32 ms quantum), views
    * as a video-like stream (time_base 1/30 s, 1-frame advance →
    * 33.33 ms quantum). Event times are compressed 16384× so inter-
    * packet gaps land near the stream quanta and the blocking + drop
    * dynamics of outputcontainer.py:82-92 actually fire; max_desync =
    * 48 ms in the compressed timeline. The `user_id % 5` slice keeps
    * the oracle's recursive simulation ~1.5k iterations. */
  /** The e21 fixture, shared with the streaming mount (e39 in
    * StreamParityQueries): the compressed-timeline two-stream kev
    * rows and the container machine they drive. */
  private[operators] def e21Fixture(s: SparkSession, d: String)
      : (org.apache.spark.sql.Dataset[StatefulRunner.KEv], OutputContainerSync) = {
    val e = eventsMs(s, d)
      .filter(col("event_type").isin("click", "view") &&
        col("user_id") % 5 === 0)
      .select((col("user_id") % 2).as("p"),
        when(col("event_type") === "click", 0).otherwise(1).as("topic"),
        col("ts_ms"), col("value"), col("event_id"))
    val mn = e.agg(min(col("ts_ms")).as("mn"))
    val kev = e.crossJoin(broadcast(mn)) // 1-row bound for the time offset
      .select(col("p").cast(StringType).as("key"), col("topic"),
        shiftright(col("ts_ms") - col("mn"), 14).as("ts"),
        col("value"), lit(null).cast(StringType).as("text"),
        lit(false).as("paused"), col("event_id").as("seq"))
      .as[StatefulRunner.KEv](StatefulRunner.kevEnc)
    val machine = new OutputContainerSync(Map(
      0 -> OcStreamCfg(1, 32000, 1024, "audio"),
      1 -> OcStreamCfg(1, 30, 1, "video")), maxDesync = 48)
    (kev, machine)
  }

  /** Shared output projection for the container trace (e21/e39). */
  private[operators] def containerTrace(
      outs: org.apache.spark.sql.Dataset[StatefulRunner.KOut]): DataFrame =
    outs.toDF()
      .select(col("key").cast(LongType).as("pipeline"),
        col("text").as("topic"), col("ts"),
        col("value").cast(LongType).as("dts"))
      .orderBy(col("pipeline"), col("ts"), col("topic"), col("dts"))

  private def e21(s: SparkSession, d: String): DataFrame = {
    val (kev, machine) = e21Fixture(s, d)
    containerTrace(StatefulRunner.runBatch(machine, kev))
  }

  /** Independent DuckDB implementation of the same action system as a
    * recursive CTE: one frontier row per pipeline; per step the first
    * applicable action fires — register head (discard if late), startup
    * barrier, emit (A then V), drop (A then V), next arrival — exactly
    * [[OutputContainerSync]]'s drain order. Durations compare in 1/96000 s
    * units (lcm of the two time bases): audio dur = cA*3, video = cV*3200;
    * quantization: audio floor((t-t0)*32000/1000) = (t-t0)*32, video
    * floor((t-t0)*30/1000) = ((t-t0)*3)//100. The paused-stream drag
    * (outputcontainer.py:94-96) is a no-op here — no pause markers in
    * the batch input — and is exercised in ContainerSpec instead. */
  private[operators] val e21Sql =
    """WITH RECURSIVE
      |pk AS (SELECT user_id % 2 AS p,
      |         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS tp,
      |         epoch_ms(ts) AS tms, event_id AS seq
      |       FROM events
      |       WHERE event_type IN ('click','view') AND user_id % 5 = 0),
      |base AS (SELECT p, tp,
      |         (tms - (SELECT min(tms) FROM pk)) // 16384 AS t, seq FROM pk),
      |lists AS (SELECT p,
      |    list(t ORDER BY t, seq) FILTER (WHERE tp = 0) AS ta,
      |    list(t ORDER BY t, seq) FILTER (WHERE tp = 1) AS tv,
      |    list(tp ORDER BY t, tp, seq) AS garr
      |  FROM base GROUP BY p),
      |sim AS (
      |  SELECT p,
      |    CAST(0 AS BIGINT) AS arrA, CAST(0 AS BIGINT) AS arrV,
      |    CAST(0 AS BIGINT) AS popA, CAST(0 AS BIGINT) AS popV,
      |    false AS hrA, false AS hrV, false AS rgA, false AS rgV,
      |    CAST(0 AS BIGINT) AS tsA, CAST(0 AS BIGINT) AS tsV,
      |    CAST(0 AS BIGINT) AS cA, CAST(0 AS BIGINT) AS cV,
      |    false AS st, CAST(0 AS BIGINT) AS t0,
      |    NULL::VARCHAR AS etp, NULL::BIGINT AS ets, NULL::BIGINT AS edts
      |  FROM lists
      |  UNION ALL
      |  SELECT p,
      |    arrA + CASE WHEN a = 'ar' AND nxt = 0 THEN 1 ELSE 0 END,
      |    arrV + CASE WHEN a = 'ar' AND nxt = 1 THEN 1 ELSE 0 END,
      |    popA + CASE WHEN a IN ('dA','eA','xA') THEN 1 ELSE 0 END,
      |    popV + CASE WHEN a IN ('dV','eV','xV') THEN 1 ELSE 0 END,
      |    CASE WHEN a = 'rA' THEN true WHEN a IN ('eA','xA') THEN false ELSE hrA END,
      |    CASE WHEN a = 'rV' THEN true WHEN a IN ('eV','xV') THEN false ELSE hrV END,
      |    CASE WHEN a = 'rA' THEN true ELSE rgA END,
      |    CASE WHEN a = 'rV' THEN true ELSE rgV END,
      |    CASE WHEN a = 'rA' THEN hA ELSE tsA END,
      |    CASE WHEN a = 'rV' THEN hV ELSE tsV END,
      |    CASE WHEN a = 'rA' AND st THEN greatest(cA, (hA - t0) * 32)
      |         WHEN a = 'st' THEN greatest(cA, (tsA - least(tsA, tsV)) * 32)
      |         WHEN a = 'eA' THEN cA + 1024
      |         ELSE cA END,
      |    CASE WHEN a = 'rV' AND st THEN greatest(cV, ((hV - t0) * 3) // 100)
      |         WHEN a = 'st' THEN greatest(cV, ((tsV - least(tsA, tsV)) * 3) // 100)
      |         WHEN a = 'eV' THEN cV + 1
      |         ELSE cV END,
      |    CASE WHEN a = 'st' THEN true ELSE st END,
      |    CASE WHEN a = 'st' THEN least(tsA, tsV) ELSE t0 END,
      |    CASE WHEN a = 'eA' THEN 'audio' WHEN a = 'eV' THEN 'video' END,
      |    CASE WHEN a = 'eA' THEN tsA WHEN a = 'eV' THEN tsV END,
      |    CASE WHEN a = 'eA' THEN cA WHEN a = 'eV' THEN cV END
      |  FROM (
      |    SELECT s3.*,
      |      CASE
      |        WHEN hA IS NOT NULL AND NOT hrA THEN
      |          CASE WHEN rgA AND hA < tsA THEN 'dA' ELSE 'rA' END
      |        WHEN hV IS NOT NULL AND NOT hrV THEN
      |          CASE WHEN rgV AND hV < tsV THEN 'dV' ELSE 'rV' END
      |        WHEN NOT st AND hrA AND hrV THEN 'st'
      |        WHEN st AND hrA AND duA = mnD AND tsA - 48 <= mnT THEN 'eA'
      |        WHEN st AND hrV AND duV = mnD AND tsV - 48 <= mnT THEN 'eV'
      |        WHEN st AND hrA AND tsA = mnT AND duA <> mnD AND nmdT - 48 > tsA THEN 'xA'
      |        WHEN st AND hrV AND tsV = mnT AND duV <> mnD AND nmdT - 48 > tsV THEN 'xV'
      |        WHEN arrA + arrV < ng THEN 'ar'
      |      END AS a,
      |      CASE WHEN arrA + arrV < ng THEN garr[arrA + arrV + 1] END AS nxt
      |    FROM (
      |      SELECT s2.*,
      |        CASE WHEN rgA AND duA = mnD THEN
      |               CASE WHEN rgV AND duV = mnD THEN least(tsA, tsV) ELSE tsA END
      |             ELSE tsV END AS nmdT
      |      FROM (
      |        SELECT s1.*,
      |          CASE WHEN rgA AND rgV THEN least(duA, duV)
      |               WHEN rgA THEN duA ELSE duV END AS mnD,
      |          CASE WHEN rgA AND rgV THEN least(tsA, tsV)
      |               WHEN rgA THEN tsA ELSE tsV END AS mnT
      |        FROM (
      |          SELECT s.*, l.ta, l.tv, l.garr, len(l.garr) AS ng,
      |            CASE WHEN popA < arrA THEN l.ta[CAST(popA + 1 AS INT)] END AS hA,
      |            CASE WHEN popV < arrV THEN l.tv[CAST(popV + 1 AS INT)] END AS hV,
      |            cA * 3 AS duA, cV * 3200 AS duV
      |          FROM sim s JOIN lists l USING (p)
      |        ) s1
      |      ) s2
      |    ) s3
      |  ) s4
      |  WHERE a IS NOT NULL
      |)
      |SELECT p AS pipeline, etp AS topic, ets AS ts, edts AS dts
      |FROM sim WHERE etp IS NOT NULL
      |ORDER BY pipeline, ts, topic, dts""".stripMargin

  /** Input-container demux restamping (SURVEY §2.2 #29;
    * inputcontainer.py:63-83): clicks model an audio stream (dts in
    * 1/32000 s samples advancing 1024/packet), views a video stream
    * (dts in 1/30 s frames advancing 1/packet); each packet's
    * stream-local dts converts to a container-relative offset and onto
    * the anchored shared timeline `t0 + offset`. Pure window math via
    * [[graft.sources.InputPacer.restamp]]; the real-time paced source
    * built on the same computation is PacerSpec territory (wall-clock
    * pacing is not SQL-expressible). */
  private def m04(s: SparkSession, d: String): DataFrame = {
    val kw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("container"), col("stream"))
      .orderBy(col("ts_ms"), col("event_id"))
    val packets = eventsMs(s, d)
      .filter(col("event_type").isin("click", "view"))
      .select((col("user_id") % 2).as("container"),
        when(col("event_type") === "click", "audio").otherwise("video")
          .as("stream"),
        col("ts_ms"), col("event_id"))
      .withColumn("i", row_number().over(kw).cast(LongType) - 1)
      .select(col("container"), col("stream"),
        when(col("stream") === "audio", col("i") * 1024).otherwise(col("i"))
          .as("dts"),
        lit(1L).as("tb_num"),
        when(col("stream") === "audio", 32000L).otherwise(30L).as("tb_den"))
    graft.sources.InputPacer.restamp(packets, 1704067200000L)
      .select(col("container"), col("stream"), col("dts"), col("offset_ms"),
        col("ts"))
      .orderBy(col("container"), col("stream"), col("dts"))
  }

  private val m04Sql =
    """WITH e AS (SELECT user_id % 2 AS container, event_type,
      |            epoch_ms(ts) AS tms, event_id
      |          FROM events WHERE event_type IN ('click','view')),
      |k AS (SELECT container,
      |        CASE WHEN event_type = 'click' THEN 'audio' ELSE 'video' END AS stream,
      |        CAST(row_number() OVER (PARTITION BY container, event_type
      |                                ORDER BY tms, event_id) - 1 AS BIGINT) AS i
      |      FROM e),
      |pk AS (SELECT container, stream,
      |         CASE WHEN stream = 'audio' THEN i * 1024 ELSE i END AS dts,
      |         CASE WHEN stream = 'audio' THEN (i * 1024 * 1000) // 32000
      |              ELSE (i * 1000) // 30 END AS offset_ms
      |       FROM k)
      |SELECT container, stream, dts, offset_ms,
      |  1704067200000 - min(offset_ms) OVER (PARTITION BY container)
      |    + offset_ms AS ts
      |FROM pk ORDER BY container, stream, dts""".stripMargin

  /** Named output/input (SURVEY §2.1 #18; namedoutput.py:26-37): two
    * producers publish per-pipeline click and purchase stats under
    * two distinct string names; an independent consumer resolves BOTH
    * names from the registry and joins its own view stats against
    * them — a multi-name round-trip, keyed by 64 pipelines so the
    * fixture has non-trivial discriminating rows (the original 2-row
    * user_id%2 version hash-matched on near-constant output). The
    * oracle computes the direct composition — a hash match proves the
    * publish → resolve indirection is exact for each name. */
  private def e23(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val e = eventsMs(s, d)
    def stats(t: String, pfx: String) = e.filter(col("event_type") === t)
      .groupBy((col("user_id") % 64).as("pipeline"))
      .agg(count(lit(1)).as(s"${pfx}_n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double")
          .as(s"${pfx}_sum"))
    graft.sources.NamedStreams.publish(stats("click", "click"),
      "named_click_stats")
    graft.sources.NamedStreams.publish(stats("purchase", "buy"),
      "named_purchase_stats")
    val clicks = graft.sources.NamedStreams.resolve(s, "named_click_stats")
    val buys = graft.sources.NamedStreams.resolve(s, "named_purchase_stats")
    stats("view", "view")
      .join(broadcast(clicks), "pipeline")
      .join(broadcast(buys), "pipeline")
      .select(col("pipeline"), col("click_n"), col("click_sum"),
        col("buy_n"), col("buy_sum"), col("view_n"), col("view_sum"))
      .orderBy(col("pipeline"))
  }

  private val e23Sql =
    """WITH ev AS (SELECT user_id % 64 AS pipeline, event_type, value
      |            FROM events),
      |c AS (SELECT pipeline, count(*) AS click_n,
      |        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS click_sum
      |      FROM ev WHERE event_type = 'click' GROUP BY pipeline),
      |b AS (SELECT pipeline, count(*) AS buy_n,
      |        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS buy_sum
      |      FROM ev WHERE event_type = 'purchase' GROUP BY pipeline),
      |v AS (SELECT pipeline, count(*) AS view_n,
      |        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS view_sum
      |      FROM ev WHERE event_type = 'view' GROUP BY pipeline)
      |SELECT pipeline, click_n, click_sum, buy_n, buy_sum, view_n, view_sum
      |FROM v JOIN c USING (pipeline) JOIN b USING (pipeline)
      |ORDER BY pipeline""".stripMargin

  val all: Seq[Q] = Seq(
    Q("e21_output_container", e21, Some(e21Sql)),
    Q("m04_demux_restamp", m04, Some(m04Sql)),
    Q("e23_named_streams", e23, Some(e23Sql)),
  )
}

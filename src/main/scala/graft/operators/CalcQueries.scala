package graft.operators

import graft.{Q, Tables}
import graft.functions.Calc
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Calculator-task queries (SURVEY §2.1 #1): the formula language of
  * /root/reference/streamtasks/system/tasks/calculator.py compiled to
  * Catalyst columns by [[graft.functions.Calc]], applied with the
  * task's state semantics — each variable holds the last value seen on
  * its input (default 0), and a result is emitted on every arriving
  * message with that message's timestamp (calculator.py:227-240).
  *
  * The oracle SQL spells out the identical arithmetic manually; the
  * oracle formulas stick to IEEE-exact ops (+ - * / % sqrt abs min max
  * comparisons ternary logic) so the hash compare is bit-exact across
  * engines. Transcendentals are covered by CalcSpec against
  * java.lang.Math instead (libm vs StrictMath can differ by ulps, so
  * they make a bad cross-engine hash oracle but a fine unit test).
  */
object CalcQueries {

  import graft.Tables.eventsMs
  private val evMs = "SELECT *, epoch_ms(ts) AS ts_ms FROM events"

  // One calculator instance per pipeline shard (see EventOps.pipeline):
  // the stateful windows partition by this so no WindowExec runs over a
  // single global partition.
  private val pipeline = pmod(col("user_id"), lit(2)).as("pipeline")
  private val pipelineSql = "user_id % 2 AS pipeline"

  /** Stateless single-input formula on the click stream:
    * `(a * 2 + 1) % 7` with Python modulo semantics. */
  private def c01(s: SparkSession, d: String): DataFrame = {
    val f = Calc.column("(a * 2 + 1) % 7", Map("a" -> col("value")))
    eventsMs(s, d).filter(col("event_type") === "click")
      .select(col("event_id"), col("ts_ms"), f.as("result"))
      .orderBy(col("event_id"))
  }

  private val c01Sql =
    s"""SELECT event_id, ts_ms,
       |  ((((value * 2 + 1) % 7) + 7) % 7) AS result
       |FROM ($evMs) WHERE event_type = 'click' ORDER BY event_id""".stripMargin

  /** Two-input last-value state: `(a + b) / 2` over a=click, b=view,
    * defaults 0, emitted on every arrival (the reference's
    * var_values map realised as ignoreNulls last() windows). */
  private def c02(s: SparkSession, d: String): DataFrame = {
    val e = eventsMs(s, d).filter(col("event_type").isin("click", "view"))
      .select(pipeline, col("event_id"), col("ts_ms"),
        when(col("event_type") === "click", col("value")).as("va"),
        when(col("event_type") === "view", col("value")).as("vb"))
    val w = Window.partitionBy(col("pipeline"))
      .orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val a = coalesce(last(col("va"), ignoreNulls = true).over(w), lit(0.0))
    val b = coalesce(last(col("vb"), ignoreNulls = true).over(w), lit(0.0))
    val f = Calc.column("(a + b) / 2", Map("a" -> a, "b" -> b))
    e.select(col("pipeline"), col("event_id"), col("ts_ms"), f.as("result"))
      .orderBy(col("event_id"))
  }

  private[operators] val c02Sql =
    s"""WITH e AS (SELECT $pipelineSql, event_id, ts_ms,
       |             CASE WHEN event_type='click' THEN value END AS va,
       |             CASE WHEN event_type='view'  THEN value END AS vb
       |           FROM ($evMs) WHERE event_type IN ('click','view'))
       |SELECT pipeline, event_id, ts_ms,
       |  (COALESCE(last_value(va IGNORE NULLS) OVER w, 0.0)
       |   + COALESCE(last_value(vb IGNORE NULLS) OVER w, 0.0)) / 2 AS result
       |FROM e WINDOW w AS (PARTITION BY pipeline ORDER BY ts_ms, event_id
       |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |ORDER BY event_id""".stripMargin

  /** Ternary + comparison + IEEE-exact functions:
    * `a > b ? sqrt(abs(a - b)) : min(a, b)`. */
  private def c03(s: SparkSession, d: String): DataFrame = {
    val e = eventsMs(s, d).filter(col("event_type").isin("click", "view"))
      .select(pipeline, col("event_id"), col("ts_ms"),
        when(col("event_type") === "click", col("value")).as("va"),
        when(col("event_type") === "view", col("value")).as("vb"))
    val w = Window.partitionBy(col("pipeline"))
      .orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val a = coalesce(last(col("va"), ignoreNulls = true).over(w), lit(0.0))
    val b = coalesce(last(col("vb"), ignoreNulls = true).over(w), lit(0.0))
    val f = Calc.column("a > b ? sqrt(abs(a - b)) : min(a, b)",
      Map("a" -> a, "b" -> b))
    e.select(col("pipeline"), col("event_id"), col("ts_ms"), f.as("result"))
      .orderBy(col("event_id"))
  }

  private val c03Sql =
    s"""WITH e AS (SELECT $pipelineSql, event_id, ts_ms,
       |             CASE WHEN event_type='click' THEN value END AS va,
       |             CASE WHEN event_type='view'  THEN value END AS vb
       |           FROM ($evMs) WHERE event_type IN ('click','view')),
       |t AS (SELECT pipeline, event_id, ts_ms,
       |        COALESCE(last_value(va IGNORE NULLS) OVER w, 0.0) AS a,
       |        COALESCE(last_value(vb IGNORE NULLS) OVER w, 0.0) AS b
       |      FROM e WINDOW w AS (PARTITION BY pipeline ORDER BY ts_ms, event_id
       |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT pipeline, event_id, ts_ms,
       |  CASE WHEN a > b THEN sqrt(abs(a - b)) ELSE least(a, b) END AS result
       |FROM t ORDER BY event_id""".stripMargin

  /** Boolean algebra with the 0.5-threshold convention:
    * `((a > 10) & (b > 10)) | ((!(a > b)) ^ (a == b))` → 0.0/1.0. */
  private def c04(s: SparkSession, d: String): DataFrame = {
    val e = eventsMs(s, d).filter(col("event_type").isin("click", "view"))
      .select(pipeline, col("event_id"), col("ts_ms"),
        when(col("event_type") === "click", col("value")).as("va"),
        when(col("event_type") === "view", col("value")).as("vb"))
    val w = Window.partitionBy(col("pipeline"))
      .orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val a = coalesce(last(col("va"), ignoreNulls = true).over(w), lit(0.0))
    val b = coalesce(last(col("vb"), ignoreNulls = true).over(w), lit(0.0))
    val f = Calc.column("((a > 10) & (b > 10)) | ((!(a > b)) ^ (a == b))",
      Map("a" -> a, "b" -> b))
    e.select(col("pipeline"), col("event_id"), col("ts_ms"), f.as("result"))
      .orderBy(col("event_id"))
  }

  private val c04Sql =
    s"""WITH e AS (SELECT $pipelineSql, event_id, ts_ms,
       |             CASE WHEN event_type='click' THEN value END AS va,
       |             CASE WHEN event_type='view'  THEN value END AS vb
       |           FROM ($evMs) WHERE event_type IN ('click','view')),
       |t AS (SELECT pipeline, event_id, ts_ms,
       |        COALESCE(last_value(va IGNORE NULLS) OVER w, 0.0) AS a,
       |        COALESCE(last_value(vb IGNORE NULLS) OVER w, 0.0) AS b
       |      FROM e WINDOW w AS (PARTITION BY pipeline ORDER BY ts_ms, event_id
       |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT pipeline, event_id, ts_ms,
       |  CASE WHEN ((CASE WHEN a > 10 THEN 1.0 ELSE 0.0 END) > 0.5
       |             AND (CASE WHEN b > 10 THEN 1.0 ELSE 0.0 END) > 0.5)
       |         OR (((CASE WHEN NOT (CASE WHEN a > b THEN 1.0 ELSE 0.0 END) > 0.5
       |                    THEN 1.0 ELSE 0.0 END) > 0.5)
       |             <> ((CASE WHEN a = b THEN 1.0 ELSE 0.0 END) > 0.5))
       |  THEN 1.0 ELSE 0.0 END AS result
       |FROM t ORDER BY event_id""".stripMargin

  /** c05: the deployment-pipeline DSL itself under the oracle gate —
    * the user-facing API a reference user actually drives (task_web
    * deployments, SURVEY §3.2). A two-stage DAG — clicks → calculator
    * "a * 2 + 1" (per-message machine path, pre-parsed AST) → gate
    * controlled by thresholded errors — is validated + compiled by
    * [[graft.plans.Pipeline.compile]] and its sunk envelope rows are
    * hash-checked against DuckDB evaluating the same composition as a
    * window query. Until round 6, compile() was exercised only by the
    * flagship smoke (rows > 0) and PipelineSpec; this checks its
    * VALUES. Machine stages replace `seq` with a content hash
    * (fromKOut — streaming-safe tie-break), so the comparison keys on
    * (ts_ms, value): deterministic because equal rows are
    * interchangeable under the hash and the gate's output multiset is
    * order-independent for same-ts data rows (state changes only on
    * control). Controls are PRE-REDUCED to one row per ts_ms
    * (last-by-event_id) on BOTH engines: two same-ts controls with
    * different thresholded sigs would otherwise make the last-gate-
    * state depend on each engine's same-ts tie-break (machine path
    * orders by content hash, oracle by event_id). */
  private def c05(s: SparkSession, d: String): DataFrame = {
    import graft.plans.Pipeline
    import graft.plans.Pipeline._
    val e = eventsMs(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("ts_ms").as("ts"), col("value"),
        lit(null).cast(StringType).as("text"), lit(false).as("paused"),
        col("event_id").as("seq"))
    val ctrl = e.filter(col("event_type") === "error")
      .groupBy(col("ts_ms"))
      .agg(max_by(col("value"), col("event_id")).as("lastv"),
        max(col("event_id")).as("seq"))
      .select(col("ts_ms").as("ts"),
        when(col("lastv") > 10, 1.0).otherwise(0.0).as("value"),
        lit(null).cast(StringType).as("text"), lit(false).as("paused"),
        col("seq"))
    val dep = Deployment("c05", Seq(
      TaskSpec("clicks", SourceOp(IOMeta.number), Nil, "a"),
      TaskSpec("ctrl", SourceOp(IOMeta.number), Nil, "play"),
      TaskSpec("calc", CalculatorOp("a * 2 + 1", Seq("a")), Seq("a"), "doubled"),
      TaskSpec("gate", GateOp(), Seq("doubled", "play"), "gated")))
    Pipeline.compile(dep, Map("a" -> clicks, "play" -> ctrl))("gated")
      .filter(!col("paused"))
      .select(col("ts").as("ts_ms"), col("value"))
      .orderBy(col("ts_ms"), col("value"))
  }

  private val c05Sql =
    s"""WITH e AS ($evMs),
       |data AS (SELECT event_id, ts_ms, value * 2 + 1 AS v,
       |                NULL::DOUBLE AS sig, 0 AS is_ctrl
       |         FROM e WHERE event_type = 'click'),
       |ctrl AS (SELECT max(event_id) AS event_id, ts_ms, NULL::DOUBLE AS v,
       |                CASE WHEN arg_max(value, event_id) > 10
       |                     THEN 1.0 ELSE 0.0 END AS sig,
       |                1 AS is_ctrl
       |         FROM e WHERE event_type = 'error' GROUP BY ts_ms),
       |u AS (SELECT * FROM data UNION ALL SELECT * FROM ctrl)
       |SELECT ts_ms, v AS value FROM (
       |  SELECT *, last_value(sig IGNORE NULLS) OVER (
       |    ORDER BY ts_ms, is_ctrl DESC, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
       |  FROM u)
       |WHERE is_ctrl = 0 AND g > 0.5 ORDER BY ts_ms, value""".stripMargin

  /** c06: the c05 DEPLOYMENT ON THE STREAMING ENGINE — the same
    * compiled DAG (source → calculator → gate), same
    * [[graft.plans.Pipeline.compile]] call, but against STREAMING
    * source frames through the file-source micro-batch mount: the
    * compiler's `isStreamingAny` branch mounts BOTH state machines as
    * chained `flatMapGroupsWithState` operators in ONE streaming
    * query (calc's var state and the gate's open/closed state live in
    * the same query's state store, crossing micro-batch boundaries —
    * chained fMGWS is supported in append mode with NoTimeout, probed
    * and now pinned by PipelineSpec). This is the reference's core
    * abstraction — a deployment (task_web.py:32-43) — executing
    * end-to-end on the production engine path, hash-equal to the
    * batch compile (c05) and to DuckDB at once. Same fixture
    * discipline as c05: controls pre-reduced to one row per ts in the
    * BATCH fixture (before chunking), same-ts data rows
    * hash-interchangeable. Chunk order = (ts, control-first, seq),
    * the gate fold's order, so the 3-way chunk split concatenates to
    * the batch fold. */
  private def c06(s: SparkSession, d: String): DataFrame = {
    import graft.plans.Pipeline
    import graft.plans.Pipeline._
    import graft.streaming.StatefulRunner.{KEv, KOut}
    val e = eventsMs(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select(lit("0").as("key"), lit(0).as("topic"),
        col("ts_ms").as("ts"), col("value"),
        lit(null).cast(StringType).as("text"), lit(false).as("paused"),
        col("event_id").as("seq"))
    val ctrl = e.filter(col("event_type") === "error")
      .groupBy(col("ts_ms"))
      .agg(max_by(col("value"), col("event_id")).as("lastv"),
        max(col("event_id")).as("seq"))
      .select(lit("0").as("key"), lit(1).as("topic"),
        col("ts_ms").as("ts"),
        when(col("lastv") > 10, 1.0).otherwise(0.0).as("value"),
        lit(null).cast(StringType).as("text"), lit(false).as("paused"),
        col("seq"))
    val dep = Deployment("c06", Seq(
      TaskSpec("clicks", SourceOp(IOMeta.number), Nil, "a"),
      TaskSpec("ctrl", SourceOp(IOMeta.number), Nil, "play"),
      TaskSpec("calc", CalculatorOp("a * 2 + 1", Seq("a")), Seq("a"),
        "doubled"),
      TaskSpec("gate", GateOp(), Seq("doubled", "play"), "gated")))
    val mount = (ds: org.apache.spark.sql.Dataset[KEv]) => {
      val df = ds.toDF()
      def env(t: Int) = df.filter(col("topic") === t)
        .select(col("ts"), col("value"), col("text"), col("paused"),
          col("seq"))
      Pipeline.compile(dep, Map("a" -> env(0), "play" -> env(1)))("gated")
        .select(lit("0").as("key"), col("ts"), col("value"), col("text"),
          col("paused"))
        .as[KOut](graft.streaming.StatefulRunner.koutEnc)
    }
    StreamParityQueries.throughStream(s, clicks.unionByName(ctrl),
        Seq(col("ts"), when(col("topic") === 1, 0).otherwise(1),
          col("seq")),
        s"c06@$d", mount, Map.empty)
      .filter(!col("paused"))
      .select(col("ts").as("ts_ms"), col("value"))
      .orderBy(col("ts_ms"), col("value"))
  }

  /** c07: the MULTI-PIPELINE deployment — c05's DAG compiled ONCE and
    * serving two pipeline instances at once via the envelope's `pipe`
    * column ([[graft.plans.Pipeline]]'s multi-instance extension):
    * every stateful task keys its machine by `dep/task#pipe`, so the
    * two gates (and two calculator var-states) live as separate
    * state-store entries of the SAME operators — the "a million
    * per-device gates spread across the cluster" shape expressed
    * through the deployment compiler rather than a hand-keyed mount.
    * The reference runs one task process per instance (task.py:28-34);
    * here instances are state-store rows of one distributed operator.
    * Oracle: c05's window SQL partitioned by pipeline. */
  private def c07(s: SparkSession, d: String): DataFrame = {
    import graft.plans.Pipeline
    import graft.plans.Pipeline._
    val e = eventsMs(s, d)
    val pipeExpr = pmod(col("user_id"), lit(2)).cast(StringType)
    val clicks = e.filter(col("event_type") === "click")
      .select(pipeExpr.as("pipe"), col("ts_ms").as("ts"), col("value"),
        lit(null).cast(StringType).as("text"), lit(false).as("paused"),
        col("event_id").as("seq"))
    // controls pre-reduced per (pipe, ts) — the c05 discipline, now
    // per pipeline instance
    val ctrl = e.filter(col("event_type") === "error")
      .groupBy(pipeExpr.as("pipe"), col("ts_ms"))
      .agg(max_by(col("value"), col("event_id")).as("lastv"),
        max(col("event_id")).as("seq"))
      .select(col("pipe"), col("ts_ms").as("ts"),
        when(col("lastv") > 10, 1.0).otherwise(0.0).as("value"),
        lit(null).cast(StringType).as("text"), lit(false).as("paused"),
        col("seq"))
    val dep = Deployment("c07", Seq(
      TaskSpec("clicks", SourceOp(IOMeta.number), Nil, "a"),
      TaskSpec("ctrl", SourceOp(IOMeta.number), Nil, "play"),
      TaskSpec("calc", CalculatorOp("a * 2 + 1", Seq("a")), Seq("a"),
        "doubled"),
      TaskSpec("gate", GateOp(), Seq("doubled", "play"), "gated")))
    Pipeline.compile(dep, Map("a" -> clicks, "play" -> ctrl))("gated")
      .filter(!col("paused"))
      .select(col("pipe").cast(LongType).as("pipeline"),
        col("ts").as("ts_ms"), col("value"))
      .orderBy(col("pipeline"), col("ts_ms"), col("value"))
  }

  private val c07Sql =
    s"""WITH e AS ($evMs),
       |data AS (SELECT user_id % 2 AS pipeline, event_id, ts_ms,
       |                value * 2 + 1 AS v, NULL::DOUBLE AS sig, 0 AS is_ctrl
       |         FROM e WHERE event_type = 'click'),
       |ctrl AS (SELECT user_id % 2 AS pipeline, max(event_id) AS event_id,
       |                ts_ms, NULL::DOUBLE AS v,
       |                CASE WHEN arg_max(value, event_id) > 10
       |                     THEN 1.0 ELSE 0.0 END AS sig,
       |                1 AS is_ctrl
       |         FROM e WHERE event_type = 'error' GROUP BY pipeline, ts_ms),
       |u AS (SELECT * FROM data UNION ALL SELECT * FROM ctrl)
       |SELECT pipeline, ts_ms, v AS value FROM (
       |  SELECT *, last_value(sig IGNORE NULLS) OVER (
       |    PARTITION BY pipeline
       |    ORDER BY ts_ms, is_ctrl DESC, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
       |  FROM u)
       |WHERE is_ctrl = 0 AND g > 0.5
       |ORDER BY pipeline, ts_ms, value""".stripMargin

  // ======================================================== c08/c09: the
  // reference's STORED-DEPLOYMENT artifact through DeploymentJson.load
  // (task_web.py:32-58 StoredTask shape, hash task_host_ids per
  // task.py:153) — the user-facing loop a streamtasks user closes to
  // run an exported deployment on this engine.

  /** Deterministic arrival-order seq for the synchronizer fan-in:
    * `(ts_ms + jitter)·2²¹ + event_id` where jitter = an md5-derived
    * value in [0, 4 h) — a BOUNDED network-style disorder: arrival
    * order tracks timestamp order at the large scale (most events
    * survive, so the downstream DAG processes a real workload) while
    * events whose timestamps sit within ~4 h of each other genuinely
    * arrive reordered, so the synchronizer's late-drop rule fires
    * hundreds of times. Mirrored exactly in the oracle's window
    * order. Monotone in the arrival order, so seq-range micro-batch
    * splits are arrival-contiguous for the streaming mount (c09). */
  private val JitterMs = 14400000L // 4 h
  private def arrivalSeq: org.apache.spark.sql.Column =
    ((col("ts_ms")
      + conv(substring(md5(col("event_id").cast(StringType)
        .cast(org.apache.spark.sql.types.BinaryType)), 1, 8), 16, 10)
        .cast(LongType) % JitterMs) * (1L << 21)
      + col("event_id"))

  private val arrivalSqlOrder =
    s"""ts_ms + CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % $JitterMs,
      |      event_id""".stripMargin

  /** Shared oracle CTEs: per-topic synchronizer late-drop (the e13/e27
    * pinned semantics — accept iff ts ≥ the running max of the topic's
    * prior ACCEPTED arrivals, in arrival order) over clicks and views. */
  private def syncAccSql(evType: String, name: String): String =
    s"""$name AS (SELECT event_id, ts_ms, value FROM (
       |    SELECT event_id, ts_ms, value,
       |      max(ts_ms) OVER (ORDER BY $arrivalSqlOrder
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seen
       |    FROM ($evMs) WHERE event_type = '$evType')
       |  WHERE ts_ms >= seen)""".stripMargin

  private def storedTask(id: Int, host: String, label: String,
      config: String, inputs: String, outputs: String): String =
    s"""{"id": "00000000-0000-4000-8000-${f"$id%012d"}",
       | "deployment_id": "00000000-0000-4000-8000-0000000000ff",
       | "task_host_id": "$host", "label": "$label",
       | "config": $config, "frontend_config": {},
       | "inputs": [$inputs], "outputs": [$outputs]}""".stripMargin

  private val FixtureNode = "graft-node"
  private def hostId(cls: String): String =
    graft.plans.DeploymentJson.taskHostId(cls, FixtureNode)

  private def numMeta(tid: Int) =
    s"""{"label": "out", "type": "ts", "content": "number", "topic_id": $tid}"""

  /** The c08 stored-deployment JSON: c05's DAG (calc → gate) PLUS a
    * synchronizer fan-in over the two data feeds — named inputs,
    * synchronizer, calculator, gate, named outputs, all with the
    * reference's config field names and hash task_host_ids. */
  private val c08Json: String = s"""{
    "deployment": {"id": "00000000-0000-4000-8000-0000000000ff", "label": "c08"},
    "tasks": [
      ${storedTask(1, hostId("NamedInputTaskHost"), "clicks",
        """{"name": "clicks", "out_topic": 1}""", "", numMeta(1))},
      ${storedTask(2, hostId("NamedInputTaskHost"), "views",
        """{"name": "views", "out_topic": 2}""", "", numMeta(2))},
      ${storedTask(3, hostId("NamedInputTaskHost"), "ctrl",
        """{"name": "ctrl", "out_topic": 3}""", "", numMeta(3))},
      ${storedTask(4, hostId("SynchronizerTaskHost"), "sync",
        """{"topics": [[1, 4], [2, 5]]}""",
        s"${numMeta(1)}, ${numMeta(2)}", s"${numMeta(4)}, ${numMeta(5)}")},
      ${storedTask(5, hostId("CalculatorTaskHost"), "calc",
        """{"formula": "a * 2 + 1", "synchronized": true,
           "variable_tracks": [{"name": "a", "default_value": 0, "in_topic": 4}],
           "out_topic": 6}""", numMeta(4), numMeta(6))},
      ${storedTask(6, hostId("GateTaskHost"), "gate",
        """{"fail_mode": "closed", "synchronized": true,
           "initial_control": false,
           "in_topic": 6, "control_topic": 3, "out_topic": 7}""",
        s"${numMeta(6)}, ${numMeta(3)}", numMeta(7))},
      ${storedTask(7, hostId("NamedOutputTaskHost"), "out",
        """{"name": "out", "in_topic": 7}""", numMeta(7), "")},
      ${storedTask(8, hostId("NamedOutputTaskHost"), "views_sync",
        """{"name": "views_sync", "in_topic": 5}""", numMeta(5), "")}
    ]}"""

  /** c08: LOAD the stored-deployment JSON → compile → run on the BATCH
    * branch, hash-checked against DuckDB composing the same DAG by
    * hand: synchronizer late-drop per feed (the e13 window), then
    * c05's calc→gate fold on the surviving clicks, plus the
    * synchronized views feed as a second tagged output (pinning the
    * synchronizer's MULTI-OUTPUT routing, not just its drop rule).
    * Fixture discipline: controls pre-reduced per ts (c05); arrival
    * order = [[arrivalSeq]] (shuffled within ts-thirds, so drops
    * genuinely fire). */
  private def c08(s: SparkSession, d: String): DataFrame = {
    import graft.plans.{DeploymentJson, Pipeline}
    val loaded = DeploymentJson.load(c08Json, nodeName = Some(FixtureNode))
    val e = eventsMs(s, d)
    def feed(t: String) = e.filter(col("event_type") === t)
      .select(col("ts_ms").as("ts"), col("value"),
        lit(null).cast(StringType).as("text"), lit(false).as("paused"),
        arrivalSeq.as("seq"))
    val ctrl = e.filter(col("event_type") === "error")
      .groupBy(col("ts_ms"))
      .agg(max_by(col("value"), col("event_id")).as("lastv"),
        max(col("event_id")).as("seq"))
      .select(col("ts_ms").as("ts"),
        when(col("lastv") > 10, 1.0).otherwise(0.0).as("value"),
        lit(null).cast(StringType).as("text"), lit(false).as("paused"),
        col("seq"))
    val ni = loaded.namedInputs
    val no = loaded.namedOutputs
    val streams = Pipeline.compile(loaded.deployment, Map(
      ni("clicks") -> feed("click"), ni("views") -> feed("view"),
      ni("ctrl") -> ctrl))
    val gated = streams(no("out")).filter(!col("paused"))
      .select(lit("gate").as("src"), col("ts").as("ts_ms"), col("value"))
    val views = streams(no("views_sync")).filter(!col("paused"))
      .select(lit("view").as("src"), col("ts").as("ts_ms"), col("value"))
    gated.unionByName(views)
      .orderBy(col("src"), col("ts_ms"), col("value"))
  }

  private val c08Sql =
    s"""WITH ${syncAccSql("click", "cacc")},
       |${syncAccSql("view", "vacc")},
       |data AS (SELECT event_id, ts_ms, value * 2 + 1 AS v,
       |                NULL::DOUBLE AS sig, 0 AS is_ctrl
       |         FROM cacc),
       |ctrl AS (SELECT max(event_id) AS event_id, ts_ms, NULL::DOUBLE AS v,
       |                CASE WHEN arg_max(value, event_id) > 10
       |                     THEN 1.0 ELSE 0.0 END AS sig,
       |                1 AS is_ctrl
       |         FROM ($evMs) WHERE event_type = 'error' GROUP BY ts_ms),
       |u AS (SELECT * FROM data UNION ALL SELECT * FROM ctrl),
       |g AS (SELECT *, last_value(sig IGNORE NULLS) OVER (
       |    ORDER BY ts_ms, is_ctrl DESC, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gs
       |  FROM u)
       |SELECT src, ts_ms, value FROM (
       |  SELECT 'gate' AS src, ts_ms, v AS value FROM g
       |  WHERE is_ctrl = 0 AND gs > 0.5
       |  UNION ALL
       |  SELECT 'view' AS src, ts_ms, value FROM vacc)
       |ORDER BY src, ts_ms, value""".stripMargin

  /** The c09 stored deployment: the synchronizer fan-in feeding the
    * calculator, named outputs on both synchronized feeds — the ops
    * whose downstream folds are order-free, so the DAG is sound on
    * the STREAMING branch where the synchronizer's release TIMING
    * (which micro-batch a blocked row unblocks in) is not part of the
    * pinned semantics. */
  private val c09Json: String = s"""{
    "deployment": {"id": "00000000-0000-4000-8000-0000000000fe", "label": "c09"},
    "tasks": [
      ${storedTask(1, hostId("NamedInputTaskHost"), "clicks",
        """{"name": "clicks", "out_topic": 1}""", "", numMeta(1))},
      ${storedTask(2, hostId("NamedInputTaskHost"), "views",
        """{"name": "views", "out_topic": 2}""", "", numMeta(2))},
      ${storedTask(3, hostId("SynchronizerTaskHost"), "sync",
        """{"topics": [[1, 3], [2, 4]]}""",
        s"${numMeta(1)}, ${numMeta(2)}", s"${numMeta(3)}, ${numMeta(4)}")},
      ${storedTask(4, hostId("CalculatorTaskHost"), "calc",
        """{"formula": "a * 2 + 1", "synchronized": true,
           "variable_tracks": [{"name": "a", "default_value": 0, "in_topic": 3}],
           "out_topic": 5}""", numMeta(3), numMeta(5))},
      ${storedTask(5, hostId("NamedOutputTaskHost"), "calc_out",
        """{"name": "calc_out", "in_topic": 5}""", numMeta(5), "")},
      ${storedTask(6, hostId("NamedOutputTaskHost"), "views_sync",
        """{"name": "views_sync", "in_topic": 4}""", numMeta(4), "")}
    ]}"""

  /** c09: the LOADED deployment on the STREAMING engine — the
    * synchronizer fan-in and the calculator mount as CHAINED
    * flatMapGroupsWithState in one streaming query through the
    * file-source micro-batch harness (c06's mount shape, now built by
    * the JSON loader): the synchronizer's dict/queue state crosses 2
    * micro-batch boundaries, blocked rows from batch N release in
    * batch N+1/N+2, and one trailing PAUSE sentinel per feed (riding
    * the last chunk — e27's in-band flush) releases the tail. Chunks
    * are seq-ranges, which is exactly the synchronizer's arrival-fold
    * order; everything downstream (single-var calculator) is
    * order-free, so no other fold constrains the split. */
  private def c09(s: SparkSession, d: String): DataFrame = {
    import graft.plans.{DeploymentJson, Pipeline}
    import graft.streaming.StatefulRunner.{KEv, KOut}
    val loaded = DeploymentJson.load(c09Json, nodeName = Some(FixtureNode))
    val ni = loaded.namedInputs
    val no = loaded.namedOutputs
    val e = eventsMs(s, d)
    def feed(t: String, topic: Int) = e.filter(col("event_type") === t)
      .select(lit("0").as("key"), lit(topic).as("topic"),
        col("ts_ms").as("ts"), col("value"),
        lit(null).cast(StringType).as("text"), lit(false).as("paused"),
        arrivalSeq.as("seq"))
    implicit val kevEnc: org.apache.spark.sql.Encoder[KEv] =
      graft.streaming.StatefulRunner.kevEnc
    // e27's end-of-stream flush: one pause marker per feed, trailing
    // every data seq, pops its topic from the synchronizer dict.
    val flush = s.createDataset(Seq(0, 1).map(t =>
      KEv("0", t, 0L, 1.0, null, paused = true,
        seq = Long.MaxValue - 2 + t))).toDF()
    val mount = (ds: org.apache.spark.sql.Dataset[KEv]) => {
      val df = ds.toDF()
      def env(t: Int) = df.filter(col("topic") === t)
        .select(col("ts"), col("value"), col("text"), col("paused"),
          col("seq"))
      val streams = Pipeline.compile(loaded.deployment,
        Map(ni("clicks") -> env(0), ni("views") -> env(1)))
      streams(no("calc_out"))
        .select(lit("calc").as("key"), col("ts"), col("value"), col("text"),
          col("paused"))
        .unionByName(streams(no("views_sync"))
          .select(lit("view").as("key"), col("ts"), col("value"),
            col("text"), col("paused")))
        .as[KOut](graft.streaming.StatefulRunner.koutEnc)
    }
    StreamParityQueries.throughStream(s,
        feed("click", 0).unionByName(feed("view", 1)).unionByName(flush),
        Seq(col("seq")), s"c09@$d", mount, Map.empty)
      .filter(!col("paused"))
      .select(col("key").as("src"), col("ts").as("ts_ms"), col("value"))
      .orderBy(col("src"), col("ts_ms"), col("value"))
  }

  private val c09Sql =
    s"""WITH ${syncAccSql("click", "cacc")},
       |${syncAccSql("view", "vacc")}
       |SELECT src, ts_ms, value FROM (
       |  SELECT 'calc' AS src, ts_ms, value * 2 + 1 AS value FROM cacc
       |  UNION ALL
       |  SELECT 'view' AS src, ts_ms, value FROM vacc)
       |ORDER BY src, ts_ms, value""".stripMargin

  // ===================================================== c10: the MEDIA
  // deployment through the stored-JSON loader — the reference's other
  // canonical pipeline family (inputcontainer → audiovolumescaler →
  // audiovolumemeter, the DAG a streamtasks user draws for live audio
  // monitoring) loaded from the task_web artifact and run with REAL
  // container bytes: per container the fixture PCM is muxed into an
  // actual RIFF/WAVE file, the inputcontainer track is bound to the
  // DEMUXED samples of those bytes, and the oracle recomputes the whole
  // chain — wav header hex, scale last-value fold, numpy-clip/truncate,
  // AudioChunker block timestamps — from the events table.

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  private def audioMeta(tid: Int) =
    s"""{"label": "out", "type": "ts", "content": "audio", "codec": "raw", "topic_id": $tid}"""

  /** Stored JSON: `inputcontainer` (source fixture.wav, one audio
    * track at 1 kHz), a named scale input, `audiovolumescaler`
    * (s16, default 1.0), `audiovolumemeter` (time_window 125 ms ⇒
    * 125-sample AudioChunker blocks), named outputs on both the
    * scaled stream and the volume signal — every config field under
    * the reference's names (audiovolumescaler.py:30-33,
    * audiovolumemeter.py:18-24, inputcontainer.py:44-60). */
  private val c10Json: String = s"""{
    "deployment": {"id": "00000000-0000-4000-8000-0000000000fd", "label": "c10"},
    "tasks": [
      ${storedTask(1, hostId("InputContainerTaskHost"), "cam",
        """{"source": "fixture.wav", "real_time": false,
           "video_tracks": [],
           "audio_tracks": [{"sample_format": "s16", "codec": "raw",
             "channels": 1, "rate": 1000, "out_topic": 1}]}""",
        "", audioMeta(1))},
      ${storedTask(2, hostId("NamedInputTaskHost"), "scale",
        """{"name": "scale", "out_topic": 2}""", "", numMeta(2))},
      ${storedTask(3, hostId("AudioVolumeScalerTaskHost"), "scaler",
        """{"sample_format": "s16", "rate": 1000, "channels": 1,
           "default_scale": 1.0, "synchronized": true,
           "in_topic": 1, "scale_topic": 2, "out_topic": 3}""",
        s"${audioMeta(1)}, ${numMeta(2)}", audioMeta(3))},
      ${storedTask(4, hostId("AudioVolumeMeterTaskHost"), "meter",
        """{"sample_format": "s16", "rate": 1000, "time_window": 125,
           "in_topic": 3, "out_topic": 4}""",
        audioMeta(3), numMeta(4))},
      ${storedTask(5, hostId("NamedOutputTaskHost"), "volume",
        """{"name": "volume", "in_topic": 4}""", numMeta(4), "")},
      ${storedTask(6, hostId("NamedOutputTaskHost"), "scaled",
        """{"name": "scaled", "in_topic": 3}""", audioMeta(3), "")}
    ]}"""

  /** c10: load [[c10Json]], bind the inputcontainer's audio track to
    * samples DEMUXED from real per-container WAV bytes (mux → demux on
    * the executors, m16's container layer), bind the scale feed from
    * the error events, run the compiled DAG MULTI-PIPELINE (one
    * machine instance per container via the pipe column — 3 here, a
    * million at scale, all in one plan), and emit three pinned views:
    * the muxed WAV bytes (md5 + length — the container layer),
    * per-container scaled-stream aggregates (the scaler machine), and
    * every volume block (the meter machine's chunker timestamps and
    * loudness values). Scale: the WAV build/demux is one mapGroups per
    * container (bytes never leave the executor); the machines key by
    * container, so the deployment fans across the cluster; the
    * loudness sum is exact integer arithmetic under the hash gate. */
  private def c10(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.plans.{DeploymentJson, Pipeline}
    import graft.sources.Wav
    val loaded = DeploymentJson.load(c10Json, nodeName = Some(FixtureNode))
    val e = eventsMs(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select((col("user_id") % 3).as("c"),
        least(greatest(round(col("value") * 100).cast(IntegerType),
          lit(-32768)), lit(32767)).as("x"),
        col("ts_ms"), col("event_id"))
      .as[(Long, Int, Long, Long)]
    // mux each container's PCM into real WAV bytes, demux them back,
    // emit one row per decoded sample + one metadata row per file
    val demuxed = clicks.groupByKey(_._1).flatMapGroups { (k, it) =>
      val xs = it.toArray.sortBy(r => (r._3, r._4)).map(_._2)
      val wav = Wav.mux(Wav.WavData(1000, 1, 16, Wav.pcm16(xs)))
      val dec = Wav.samples16(Wav.demux(wav).data)
      val md5 = md5Hex(wav.map("%02x".format(_)).mkString.getBytes("UTF-8"))
      dec.iterator.zipWithIndex.map { case (x, i) =>
        ("s", k, i.toLong, x.toLong, null: String)
      } ++ Iterator(("w", k, wav.length.toLong, 0L, md5))
    }.toDF("kind", "c", "a", "b", "md5").cache()
    val samples = demuxed.filter(col("kind") === "s")
      .select(col("c").cast(StringType).as("pipe"), col("a").as("ts"),
        col("b").cast(DoubleType).as("value"),
        lit(null).cast(StringType).as("text"), lit(false).as("paused"),
        col("a").as("seq"))
    // scale feed: error events mapped into each container's sample
    // clock (ts = event_id mod container sample count), value > 10 ⇒
    // gain 2.0 else attenuation 0.5 — collides with data timestamps on
    // purpose (the scale-first tie-break is part of the pinned fold)
    val nc = clicks.groupBy(col("c")).agg(count(lit(1)).as("nc"))
    val scales = e.filter(col("event_type") === "error")
      .select((col("user_id") % 3).as("c"), col("value"), col("event_id"))
      .join(nc, "c")
      .select(col("c").cast(StringType).as("pipe"),
        (col("event_id") % col("nc")).as("ts"),
        when(col("value") > 10, 2.0).otherwise(0.5).as("value"),
        lit(null).cast(StringType).as("text"), lit(false).as("paused"),
        col("event_id").as("seq"))
    val ni = loaded.namedInputs
    val no = loaded.namedOutputs
    val streams = Pipeline.compile(loaded.deployment, Map(
      ni("fixture.wav#audio0") -> samples, ni("scale") -> scales))
    val vol = streams(no("volume")).filter(!col("paused"))
      .select(lit("vol").as("kind"), col("pipe").cast(LongType).as("container"),
        col("ts").as("ts_ms"), col("value"), lit(125L).as("n"),
        lit(null).cast(StringType).as("md5"))
    val scaled = streams(no("scaled")).filter(!col("paused"))
      .groupBy(col("pipe").cast(LongType).as("container"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value"))
      .select(lit("scaled").as("kind"), col("container"),
        lit(0L).as("ts_ms"), col("value"), col("n"),
        lit(null).cast(StringType).as("md5"))
    val wavMeta = demuxed.filter(col("kind") === "w")
      .select(lit("wav").as("kind"), col("c").as("container"),
        lit(0L).as("ts_ms"), lit(null).cast(DoubleType).as("value"),
        col("a").as("n"), col("md5"))
    vol.unionByName(scaled).unionByName(wavMeta)
      .orderBy(col("kind"), col("container"), col("ts_ms"))
  }

  private val c10Sql =
    s"""WITH s AS (SELECT user_id % 3 AS c,
       |    least(greatest(CAST(round(value * 100) AS INT), -32768), 32767) AS x,
       |    ts_ms, event_id
       |  FROM ($evMs) WHERE event_type = 'click'),
       |idx AS (SELECT c, x,
       |    row_number() OVER (PARTITION BY c ORDER BY ts_ms, event_id) - 1 AS i
       |  FROM s),
       |n AS (SELECT c, count(*) AS nc FROM idx GROUP BY c),
       |-- scale feed on the sample clock; multiple events on one tick
       |-- fold to the last by event_id (the machine steps in seq order)
       |sc AS (SELECT e.user_id % 3 AS c, e.event_id % n.nc AS ts,
       |    CASE WHEN e.value > 10 THEN 2.0 ELSE 0.5 END AS sv, e.event_id
       |  FROM ($evMs) e JOIN n ON e.user_id % 3 = n.c
       |  WHERE e.event_type = 'error'),
       |-- the scaler's last-value fold: scale events sort BEFORE data
       |-- at equal timestamps (control-first tie-break)
       |u AS (SELECT c, i AS ts, 0 AS is_scale, i AS seq,
       |             CAST(x AS DOUBLE) AS x, NULL::DOUBLE AS sv FROM idx
       |      UNION ALL
       |      SELECT c, ts, 1 AS is_scale, event_id AS seq, NULL, sv FROM sc),
       |f AS (SELECT *, coalesce(last_value(sv IGNORE NULLS) OVER (
       |        PARTITION BY c ORDER BY ts, is_scale DESC, seq
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 1.0) AS eff
       |      FROM u),
       |-- numpy clip + astype: clamp to the s16 range, truncate toward 0
       |y AS (SELECT c, ts AS i,
       |        CAST(trunc(least(greatest(x * eff, -32768.0), 32767.0)) AS BIGINT) AS y
       |      FROM f WHERE is_scale = 0),
       |-- AudioChunker at 1 kHz: block k covers samples [125k, 125k+125)
       |-- and releases only when sample 125k+125 ARRIVES (buffer must
       |-- exceed chunk_size), stamped at its head sample's time
       |vol AS (SELECT y.c, (y.i // 125) * 125 AS ts_ms,
       |        sqrt(CAST(sum(abs(y.y)) AS DOUBLE) / 32767.0 / 125.0) AS value
       |      FROM y JOIN n ON y.c = n.c
       |      WHERE (y.i // 125) * 125 + 125 <= n.nc - 1
       |      GROUP BY y.c, y.i // 125),
       |hex AS (SELECT c,
       |    string_agg(printf('%02x%02x', ((x + 65536) % 65536) % 256,
       |      ((x + 65536) % 65536) // 256), '' ORDER BY i) AS datahex,
       |    count(*) AS nc
       |  FROM (SELECT c, x, i FROM idx) GROUP BY c),
       |wav AS (SELECT c, nc, md5('52494646' ||
       |    printf('%02x%02x%02x%02x', (36 + 2*nc) % 256, ((36 + 2*nc) // 256) % 256,
       |      ((36 + 2*nc) // 65536) % 256, ((36 + 2*nc) // 16777216) % 256) ||
       |    '57415645666d74201000000001000100e8030000d007000002001000' ||
       |    '64617461' ||
       |    printf('%02x%02x%02x%02x', (2*nc) % 256, ((2*nc) // 256) % 256,
       |      ((2*nc) // 65536) % 256, ((2*nc) // 16777216) % 256) ||
       |    datahex) AS md5
       |  FROM hex)
       |SELECT kind, container, ts_ms, value, n, md5 FROM (
       |  SELECT 'vol' AS kind, c AS container, ts_ms, value,
       |         125::BIGINT AS n, NULL::VARCHAR AS md5 FROM vol
       |  UNION ALL
       |  SELECT 'scaled', c, 0, CAST(sum(y) AS DOUBLE), count(*), NULL
       |  FROM y GROUP BY c
       |  UNION ALL
       |  SELECT 'wav', c, 0, NULL, 44 + 2 * nc, md5 FROM wav)
       |ORDER BY kind, container, ts_ms""".stripMargin

  // ================================================== c11: the VIDEO
  // monitoring deployment through the loader — inputcontainer (video
  // track) → videoreformatter (rgba→bgra swizzle) → videolayout
  // (nearest-neighbour place onto a canvas) → videoactivitymeter
  // (uint8-wraparound frame diff, the reference's exact numpy
  // arithmetic) — the DAG a streamtasks user draws for motion
  // monitoring (videoactivitymeter.py's README use case). Frames are
  // 4×4 RGBA payloads riding the envelope as hex; every byte of the
  // laid-out stream and every activity value is predicted by the
  // oracle from the (event_id, position) pixel formula composed with
  // the swizzle and layout index maps.

  private def videoMeta(tid: Int) =
    s"""{"label": "out", "type": "ts", "content": "video", "codec": "raw", "topic_id": $tid}"""

  private val c11Json: String = s"""{
    "deployment": {"id": "00000000-0000-4000-8000-0000000000fc", "label": "c11"},
    "tasks": [
      ${storedTask(1, hostId("InputContainerTaskHost"), "cam",
        """{"source": "cam.mkv", "real_time": false,
           "video_tracks": [{"pixel_format": "rgba", "codec": "raw",
             "width": 4, "height": 4, "rate": 30, "out_topic": 1}],
           "audio_tracks": []}""", "", videoMeta(1))},
      ${storedTask(2, hostId("VideoReformatterTaskHost"), "fmt",
        """{"pixel_format": "bgra", "in_topic": 1, "out_topic": 2}""",
        videoMeta(1), videoMeta(2))},
      ${storedTask(3, hostId("VideoLayoutTaskHost"), "layout",
        """{"pixel_format": "rgba", "in_width": 4, "in_height": 4,
           "place_width": 2, "place_height": 2,
           "place_top_offset": 1, "place_left_offset": 1,
           "out_width": 4, "out_height": 4,
           "in_topic": 2, "out_topic": 3}""",
        videoMeta(2), videoMeta(3))},
      ${storedTask(4, hostId("VideoActivityMeterTaskHost"), "meter",
        """{"width": 4, "height": 4, "in_topic": 3, "out_topic": 4}""",
        videoMeta(3), numMeta(4))},
      ${storedTask(5, hostId("NamedOutputTaskHost"), "activity",
        """{"name": "activity", "in_topic": 4}""", numMeta(4), "")},
      ${storedTask(6, hostId("NamedOutputTaskHost"), "frames",
        """{"name": "frames", "in_topic": 3}""", videoMeta(3), "")}
    ]}"""

  /** c11: load [[c11Json]], bind the video track to synthetic 4×4
    * RGBA frames (byte j of frame with event id E = (7E + 13j) mod
    * 256 — affine, so the oracle composes it through the swizzle and
    * layout index maps in closed form), run MULTI-PIPELINE over 2
    * containers, and pin (a) every activity value (the meter's
    * uint8-wraparound mean over the laid-out frames) and (b) the md5
    * of each pipe's entire laid-out frame stream in frame order —
    * every byte the layout and reformatter produced, end to end.
    * Scale: stateless swizzle/layout stay in one whole-stage span
    * per partition; only the meter is keyed state, one machine per
    * container. */
  private def c11(s: SparkSession, d: String): DataFrame = {
    import graft.plans.{DeploymentJson, Pipeline}
    val loaded = DeploymentJson.load(c11Json, nodeName = Some(FixtureNode))
    val e = eventsMs(s, d)
    val w = Window.partitionBy(col("pipe")).orderBy(col("ts_ms"), col("event_id"))
    val frameUdf = udf((eid: Long) =>
      graft.streaming.StateMachines.hexEnc(
        Array.tabulate(64)(j => ((eid * 7 + j * 13) % 256).toByte)))
    val frames = e.filter(col("event_type") === "click")
      .select((col("user_id") % 2).cast(StringType).as("pipe"),
        col("ts_ms"), col("event_id"))
      .withColumn("f", (row_number().over(w) - 1).cast(LongType))
      .select(col("pipe"), col("f").as("ts"),
        lit(Double.NaN).as("value"), // NaN: the text-payload convention
        frameUdf(col("event_id")).as("text"), lit(false).as("paused"),
        col("f").as("seq"))
    val ni = loaded.namedInputs
    val no = loaded.namedOutputs
    val streams = Pipeline.compile(loaded.deployment,
      Map(ni("cam.mkv#video0") -> frames))
    val act = streams(no("activity")).filter(!col("paused"))
      .select(lit("act").as("kind"),
        col("pipe").cast(LongType).as("container"), col("ts").as("ts_ms"),
        col("value"), lit(64L).as("n"), lit(null).cast(StringType).as("md5"))
    val frm = streams(no("frames")).filter(!col("paused"))
      .groupBy(col("pipe").cast(LongType).as("container"))
      .agg(count(lit(1)).as("n"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("ts"), col("text")))),
          x => x("text")), "").cast(BinaryType)).as("md5"))
      .select(lit("frm").as("kind"), col("container"), lit(0L).as("ts_ms"),
        lit(null).cast(DoubleType).as("value"), col("n"), col("md5"))
    act.unionByName(frm)
      .orderBy(col("kind"), col("container"), col("ts_ms"))
  }

  /** The laid-out byte at (y, x, channel c) of frame E:
    * inside the 2×2 place at (1,1), source pixel = ((y−1)·2, (x−1)·2)
    * after the rgba→bgra swizzle [2,1,0,3]; outside, transparent 0. */
  private val c11Sql =
    s"""WITH e AS (SELECT user_id % 2 AS pipe, epoch_ms(ts) AS tms, event_id
       |  FROM ($evMs) WHERE event_type = 'click'),
       |fr AS (SELECT pipe, event_id,
       |    row_number() OVER (PARTITION BY pipe ORDER BY tms, event_id) - 1 AS f
       |  FROM e),
       |pos AS (SELECT unnest(range(0, 64)) AS j),
       |-- laid-out byte: j = (y*4+x)*4+c; placed iff y,x in 1..2
       |lb AS (SELECT fr.pipe, fr.f, pos.j,
       |    CASE WHEN (pos.j // 4) // 4 BETWEEN 1 AND 2
       |          AND (pos.j // 4) % 4 BETWEEN 1 AND 2
       |    THEN (fr.event_id * 7 + 13 * (
       |        ((((pos.j // 4) // 4 - 1) * 2) * 4 + ((pos.j // 4) % 4 - 1) * 2) * 4
       |        + [2, 1, 0, 3][pos.j % 4 + 1])) % 256
       |    ELSE 0 END AS b
       |  FROM fr, pos),
       |hexes AS (SELECT pipe, f,
       |    string_agg(printf('%02x', b), '' ORDER BY j) AS hex
       |  FROM lb GROUP BY pipe, f),
       |diffs AS (SELECT cur.pipe, cur.f,
       |    sum((prv.b - cur.b + 256) % 256) AS sad -- (prev − cur) mod 256
       |  FROM lb cur JOIN lb prv ON cur.pipe = prv.pipe
       |    AND prv.f = cur.f - 1 AND cur.j = prv.j
       |  GROUP BY cur.pipe, cur.f)
       |SELECT kind, container, ts_ms, value, n, md5 FROM (
       |  SELECT 'act' AS kind, pipe AS container, f AS ts_ms,
       |         CAST(sad AS DOUBLE) / 64.0 AS value, 64::BIGINT AS n,
       |         NULL::VARCHAR AS md5
       |  FROM diffs
       |  UNION ALL
       |  SELECT 'frm', pipe, 0, NULL, count(*),
       |         md5(string_agg(hex, '' ORDER BY f))
       |  FROM hexes GROUP BY pipe)
       |ORDER BY kind, container, ts_ms""".stripMargin

  // =================================================== c12: the AUDIO
  // codec deployment through the loader — inputcontainer delivering
  // two μ-law-CODED tracks → audiodecoder ×2 → audiomixer →
  // audioresampler (1 kHz → 250 Hz decimation) → audioencoder — the
  // transcode-and-mix DAG of the reference's media README, with the
  // codec metadata flowing through the wiring type-check (a μ-law
  // track refuses to connect to a raw-audio consumer). The oracle
  // recomputes the G.711 companding, the aligned mixer sum with its
  // blocked tail, the decimation phase and the re-encode.

  private def codedMeta(tid: Int) =
    s"""{"label": "out", "type": "ts", "content": "audio", "codec": "pcm_mulaw", "topic_id": $tid}"""

  private val c12Json: String = s"""{
    "deployment": {"id": "00000000-0000-4000-8000-0000000000fb", "label": "c12"},
    "tasks": [
      ${storedTask(1, hostId("InputContainerTaskHost"), "mic",
        """{"source": "mic.wav", "real_time": false,
           "video_tracks": [],
           "audio_tracks": [
             {"sample_format": "s16", "codec": "pcm_mulaw", "channels": 1,
              "rate": 1000, "out_topic": 1},
             {"sample_format": "s16", "codec": "pcm_mulaw", "channels": 1,
              "rate": 1000, "out_topic": 2}]}""",
        "", s"${codedMeta(1)}, ${codedMeta(2)}")},
      ${storedTask(2, hostId("AudioDecoderTaskHost"), "dec_a",
        """{"codec": "pcm_mulaw", "decoder": "pcm_mulaw", "rate": 1000,
           "in_topic": 1, "out_topic": 3}""",
        codedMeta(1), audioMeta(3))},
      ${storedTask(3, hostId("AudioDecoderTaskHost"), "dec_b",
        """{"codec": "pcm_mulaw", "decoder": "pcm_mulaw", "rate": 1000,
           "in_topic": 2, "out_topic": 4}""",
        codedMeta(2), audioMeta(4))},
      ${storedTask(4, hostId("AudioMixerTaskHost"), "mix",
        """{"sample_format": "s16", "rate": 1000, "channels": 1,
           "audio_tracks": [{"in_topic": 3}, {"in_topic": 4}],
           "out_topic": 5}""",
        s"${audioMeta(3)}, ${audioMeta(4)}", audioMeta(5))},
      ${storedTask(5, hostId("AudioResamplerTaskHost"), "resample",
        """{"in_sample_format": "s16", "in_rate": 1000, "in_channels": 1,
           "out_sample_format": "s16", "out_rate": 250, "out_channels": 1,
           "in_topic": 5, "out_topic": 6}""",
        audioMeta(5), audioMeta(6))},
      ${storedTask(6, hostId("AudioEncoderTaskHost"), "enc",
        """{"codec": "pcm_mulaw", "encoder": "pcm_mulaw", "rate": 250,
           "in_topic": 6, "out_topic": 7}""",
        audioMeta(6), codedMeta(7))},
      ${storedTask(7, hostId("NamedOutputTaskHost"), "packets",
        """{"name": "packets", "in_topic": 7}""", codedMeta(7), "")},
      ${storedTask(8, hostId("NamedOutputTaskHost"), "mixed",
        """{"name": "mixed", "in_topic": 5}""", audioMeta(5), "")}
    ]}"""

  /** c12: load [[c12Json]], bind the two coded tracks to μ-law bytes
    * ENCODED ON THE EXECUTORS from the click/view streams (each pipe's
    * tracks share a dense sample clock, so the mixer's aligned sum and
    * its blocked tail — the shorter track ends and the longer one's
    * remainder waits forever, send_next's `num_sample_counts <= 0`
    * guard — are both exercised), run MULTI-PIPELINE over 2
    * containers, and pin every re-encoded packet value plus the mixed
    * stream's exact integer aggregates. The oracle recomputes G.711
    * encode→decode→sum→decimate→encode in closed form (the p07
    * formulas composed). Scale: the codecs are per-sample projections
    * or O(1)-state machines; the mixer keys by container. */
  private def c12(s: SparkSession, d: String): DataFrame = {
    import graft.plans.{DeploymentJson, Pipeline}
    val loaded = DeploymentJson.load(c12Json, nodeName = Some(FixtureNode))
    val e = eventsMs(s, d)
    val encUdf = udf((x: Long) =>
      graft.functions.Codec.MuLaw.encodeSample(x.toInt).toDouble)
    def feed(t: String) = {
      val w = Window.partitionBy(col("pipe")).orderBy(col("ts_ms"), col("event_id"))
      e.filter(col("event_type") === t)
        .select((col("user_id") % 2).cast(StringType).as("pipe"),
          col("ts_ms"), col("event_id"),
          greatest(lit(-1000L), least(lit(1000L),
            floor(col("value") * 10).cast(LongType) *
              when(col("event_id") % 2 === 0, 1L).otherwise(-1L))).as("x"))
        .withColumn("i", (row_number().over(w) - 1).cast(LongType))
        .select(col("pipe"), col("i").as("ts"), encUdf(col("x")).as("value"),
          lit(null).cast(StringType).as("text"), lit(false).as("paused"),
          col("i").as("seq"))
    }
    val ni = loaded.namedInputs
    val no = loaded.namedOutputs
    val streams = Pipeline.compile(loaded.deployment, Map(
      ni("mic.wav#audio0") -> feed("click"), ni("mic.wav#audio1") -> feed("view")))
    val pkt = streams(no("packets")).filter(!col("paused"))
      .select(lit("pkt").as("kind"), col("pipe").cast(LongType).as("container"),
        col("ts").as("ts_ms"), col("value"),
        lit(null).cast(LongType).as("n"))
    val mixed = streams(no("mixed")).filter(!col("paused"))
      .groupBy(col("pipe").cast(LongType).as("container"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value"))
      .select(lit("mix").as("kind"), col("container"), lit(0L).as("ts_ms"),
        col("value"), col("n"))
    pkt.unionByName(mixed)
      .orderBy(col("kind"), col("container"), col("ts_ms"))
  }

  /** G.711 μ-law encode/decode as SQL macros (the p07 formulas). */
  private def mulawEncSql(x: String): String =
    s"""(255 - ((CASE WHEN $x < 0 THEN 128 ELSE 0 END)
       | + (CASE WHEN least(abs($x), 32635) + 132 < 256 THEN 0
       |        WHEN least(abs($x), 32635) + 132 < 512 THEN 1
       |        WHEN least(abs($x), 32635) + 132 < 1024 THEN 2
       |        WHEN least(abs($x), 32635) + 132 < 2048 THEN 3
       |        WHEN least(abs($x), 32635) + 132 < 4096 THEN 4
       |        WHEN least(abs($x), 32635) + 132 < 8192 THEN 5
       |        WHEN least(abs($x), 32635) + 132 < 16384 THEN 6
       |        ELSE 7 END) * 16
       | + ((least(abs($x), 32635) + 132)
       |    // (8 * (1 << (CASE WHEN least(abs($x), 32635) + 132 < 256 THEN 0
       |        WHEN least(abs($x), 32635) + 132 < 512 THEN 1
       |        WHEN least(abs($x), 32635) + 132 < 1024 THEN 2
       |        WHEN least(abs($x), 32635) + 132 < 2048 THEN 3
       |        WHEN least(abs($x), 32635) + 132 < 4096 THEN 4
       |        WHEN least(abs($x), 32635) + 132 < 8192 THEN 5
       |        WHEN least(abs($x), 32635) + 132 < 16384 THEN 6
       |        ELSE 7 END)))) % 16))""".stripMargin

  private def mulawDecSql(y: String): String =
    s"""(CASE WHEN (255 - $y) >= 128
       |  THEN -((((255 - $y) % 16) * 8 + 132) * (1 << (((255 - $y) // 16) % 8)) - 132)
       |  ELSE ((((255 - $y) % 16) * 8 + 132) * (1 << (((255 - $y) // 16) % 8)) - 132)
       |END)""".stripMargin

  private val c12Sql = {
    def feedSql(evType: String) =
      s"""SELECT user_id % 2 AS pipe,
         |  row_number() OVER (PARTITION BY user_id % 2
         |    ORDER BY ts_ms, event_id) - 1 AS i,
         |  greatest(-1000, least(1000, CAST(floor(value * 10) AS BIGINT)
         |    * (CASE WHEN event_id % 2 = 0 THEN 1 ELSE -1 END))) AS x
         |FROM ($evMs) WHERE event_type = '$evType'""".stripMargin
    s"""WITH fa AS (${feedSql("click")}),
       |fb AS (${feedSql("view")}),
       |-- container layer: μ-law encode on the way in, decode at dec_a/b
       |da AS (SELECT pipe, i, ${mulawDecSql(mulawEncSql("x"))} AS v FROM fa),
       |db AS (SELECT pipe, i, ${mulawDecSql(mulawEncSql("x"))} AS v FROM fb),
       |-- mixer: aligned sum on the shared clock; the blocked tail ends
       |-- at the shorter track (send_next blocks when a queue is empty)
       |nn AS (SELECT a.pipe, least(max(a.mi), max(b.mi)) + 1 AS nmix
       |  FROM (SELECT pipe, max(i) AS mi FROM da GROUP BY pipe) a
       |  JOIN (SELECT pipe, max(i) AS mi FROM db GROUP BY pipe) b
       |    ON a.pipe = b.pipe GROUP BY a.pipe),
       |mixed AS (SELECT da.pipe, da.i, da.v + db.v AS v
       |  FROM da JOIN db ON da.pipe = db.pipe AND da.i = db.i
       |  JOIN nn ON da.pipe = nn.pipe
       |  WHERE da.i < nn.nmix),
       |-- resampler: keep every 4th mixed tick (1000 → 250 decimation)
       |res AS (SELECT pipe, i, v FROM mixed WHERE i % 4 = 0),
       |pkt AS (SELECT pipe, i, ${mulawEncSql("v")} AS enc FROM res)
       |SELECT kind, container, ts_ms, value, n FROM (
       |  SELECT 'pkt' AS kind, pipe AS container, i AS ts_ms,
       |         CAST(enc AS DOUBLE) AS value, NULL::BIGINT AS n FROM pkt
       |  UNION ALL
       |  SELECT 'mix', pipe, 0, CAST(sum(v) AS DOUBLE), count(*)
       |  FROM mixed GROUP BY pipe)
       |ORDER BY kind, container, ts_ms""".stripMargin
  }

  // =============================================== c13: the INFERENCE
  // deployment through the loader — the §2.4 task family wired as a
  // stored artifact: an ASR leg (inputcontainer audio →
  // asrspeechrecognition with the TRAINED AsrTiny head → transcript)
  // and a TTS leg (text prompt → fastspeech2tts length-regulated
  // synth → smespeechenhancement noise gate → audiovolumemeter).
  // The oracle recomputes both legs: the integer matmul + argmax +
  // CTC collapse against the same weight literals (m15's chain), and
  // the envelope synth → gate → AudioChunker loudness composition.

  private def textMeta(tid: Int) =
    s"""{"label": "out", "type": "ts", "content": "text", "topic_id": $tid}"""

  private val c13Json: String = s"""{
    "deployment": {"id": "00000000-0000-4000-8000-0000000000fa", "label": "c13"},
    "tasks": [
      ${storedTask(1, hostId("InputContainerTaskHost"), "mic2",
        """{"source": "mic2.wav", "real_time": false,
           "video_tracks": [],
           "audio_tracks": [{"sample_format": "s16", "codec": "raw",
             "channels": 1, "rate": 1000, "out_topic": 1}]}""",
        "", audioMeta(1))},
      ${storedTask(2, hostId("ASRSpeechRecognitionTaskHost"), "asr",
        """{"source": "graft/asr_tiny", "device": "cpu",
           "chunk_samples": 8, "in_topic": 1, "out_topic": 2}""",
        audioMeta(1), textMeta(2))},
      ${storedTask(3, hostId("NamedOutputTaskHost"), "transcript",
        """{"name": "transcript", "in_topic": 2}""", textMeta(2), "")},
      ${storedTask(4, hostId("NamedInputTaskHost"), "prompt",
        """{"name": "prompt", "out_topic": 3}""", "", textMeta(3))},
      ${storedTask(5, hostId("FastSpeech2TTSTaskHost"), "tts",
        """{"source": "graft/tts_envelope", "device": "cpu", "pace": 1.0,
           "in_topic": 3, "out_topic": 4}""",
        textMeta(3), audioMeta(4))},
      ${storedTask(6, hostId("SMESpeechEnhancementTaskHost"), "enhance",
        """{"source": "graft/noise_gate", "device": "cpu", "threshold": 5,
           "in_topic": 4, "out_topic": 5}""",
        audioMeta(4), audioMeta(5))},
      ${storedTask(7, hostId("AudioVolumeMeterTaskHost"), "meter",
        """{"sample_format": "s16", "rate": 1000, "time_window": 32,
           "in_topic": 5, "out_topic": 6}""",
        audioMeta(5), numMeta(6))},
      ${storedTask(8, hostId("NamedOutputTaskHost"), "volume",
        """{"name": "volume", "in_topic": 6}""", numMeta(6), "")}
    ]}"""

  /** c13: load [[c13Json]] and run both inference legs MULTI-PIPELINE
    * over 8 containers. The ASR feed replays m15's trained-model
    * fixture through the envelope (each click = one 8-sample feature
    * frame; the machine buffers the chunk, runs the jar-shipped
    * integer softmax head, and CTC-collapses); the TTS feed turns
    * each error event's digits into a prompt whose synthesized,
    * noise-gated envelope the volume meter re-chunks. Both oracles
    * are closed-form: the matmul/argmax/collapse against the same
    * weight literals, and the amp·tri synth composed with the gate
    * and the chunker timestamp rule. */
  private def c13(s: SparkSession, d: String): DataFrame = {
    import graft.plans.{DeploymentJson, Pipeline}
    val loaded = DeploymentJson.load(c13Json, nodeName = Some(FixtureNode))
    val e = eventsMs(s, d)
    val w = Window.partitionBy(col("pipe")).orderBy(col("ts_ms"), col("event_id"))
    val frameUdf = udf((cls: Int, eid: Long) =>
      graft.functions.AsrTiny.frameSynth(cls, eid).map(_.toDouble))
    val asrFeed = e.filter(col("event_type") === "click")
      .select((col("user_id") % 8).cast(StringType).as("pipe"),
        col("ts_ms"), col("event_id"),
        when(col("event_id") % 3 === 0, 0)
          .otherwise(col("event_id") % 5 + 1).cast(IntegerType).as("cls"))
      .withColumn("f", (row_number().over(w) - 1).cast(LongType))
      .select(col("pipe"), col("f"),
        posexplode(frameUdf(col("cls"), col("event_id"))).as(Seq("j", "x")))
      .select(col("pipe"), (col("f") * 8 + col("j")).as("ts"),
        col("x").as("value"), lit(null).cast(StringType).as("text"),
        lit(false).as("paused"), (col("f") * 8 + col("j")).as("seq"))
    val promptFeed = e.filter(col("event_type") === "error")
      .select((col("user_id") % 8).cast(StringType).as("pipe"),
        col("ts_ms"), col("event_id"),
        abs(round(col("value") * 100)).cast(LongType).cast(StringType)
          .as("prompt"))
      .withColumn("i", (row_number().over(w) - 1).cast(LongType))
      .select(col("pipe"), (col("i") * 1000).as("ts"),
        lit(Double.NaN).as("value"), col("prompt").as("text"),
        lit(false).as("paused"), col("i").as("seq"))
    val ni = loaded.namedInputs
    val no = loaded.namedOutputs
    val streams = Pipeline.compile(loaded.deployment, Map(
      ni("mic2.wav#audio0") -> asrFeed, ni("prompt") -> promptFeed))
    val asr = streams(no("transcript")).filter(!col("paused"))
      .select(lit("asr").as("kind"), col("pipe").cast(LongType).as("container"),
        col("ts").as("ts_ms"), col("value"))
    val vol = streams(no("volume")).filter(!col("paused"))
      .select(lit("vol").as("kind"), col("pipe").cast(LongType).as("container"),
        col("ts").as("ts_ms"), col("value"))
    asr.unionByName(vol)
      .orderBy(col("kind"), col("container"), col("ts_ms"))
  }

  private val c13Sql = {
    val m = graft.functions.AsrTiny.model
    s"""WITH e AS (SELECT user_id % 8 AS pipe, epoch_ms(ts) AS ts_ms, event_id,
       |    CASE WHEN event_id % 3 = 0 THEN 0 ELSE event_id % 5 + 1 END AS cls
       |  FROM ($evMs) WHERE event_type = 'click'),
       |fr AS (SELECT pipe, ts_ms, event_id, cls,
       |    row_number() OVER (PARTITION BY pipe ORDER BY ts_ms, event_id) - 1 AS f
       |  FROM e),
       |x AS (SELECT pipe, f, j,
       |    ${graft.functions.AsrTiny.synthXSql} AS x
       |  FROM fr, (SELECT unnest(generate_series(1, ${m.dim})) AS j) js),
       |l AS (SELECT pipe, f, k,
       |    ${graft.functions.AsrTiny.logitSql} AS logit
       |  FROM x, (SELECT unnest(generate_series(1, ${m.classes})) AS k) ks
       |  GROUP BY pipe, f, k),
       |pred AS (SELECT pipe, f, k - 1 AS p FROM (
       |    SELECT *, row_number() OVER (PARTITION BY pipe, f
       |      ORDER BY logit DESC, k) AS r FROM l) WHERE r = 1),
       |asr AS (SELECT pipe, f * 8 + 7 AS ts_ms, CAST(p AS DOUBLE) AS value
       |  FROM (SELECT pipe, f, p,
       |          coalesce(lag(p) OVER (PARTITION BY pipe ORDER BY f), 0) AS prev
       |        FROM pred)
       |  WHERE p != prev AND p != 0),
       |-- TTS leg: digits prompt → amp·tri envelope → gate → chunker
       |pr AS (SELECT user_id % 8 AS pipe,
       |    row_number() OVER (PARTITION BY user_id % 8
       |      ORDER BY epoch_ms(ts), event_id) - 1 AS i,
       |    CAST(CAST(abs(round(value * 100)) AS BIGINT) AS VARCHAR) AS prompt
       |  FROM events WHERE event_type = 'error'),
       |chars AS (SELECT pipe, i, ci, ascii(substr(prompt, ci + 1, 1)) AS c
       |  FROM pr, (SELECT unnest(range(0, 24)) AS ci) cs
       |  WHERE ci < length(prompt)),
       |synth AS (SELECT pipe, i * 1000 + ci * 8 + j AS ts,
       |    ((c % 16) + 1) * (CASE WHEN j % 8 < 4 THEN j % 8 ELSE 8 - j % 8 END) AS v
       |  FROM chars, (SELECT unnest(range(0, 8)) AS j) js),
       |gated AS (SELECT pipe, ts,
       |    CASE WHEN abs(v) < 5 THEN 0 ELSE v END AS v FROM synth),
       |seqd AS (SELECT pipe, ts, v,
       |    row_number() OVER (PARTITION BY pipe ORDER BY ts) - 1 AS k
       |  FROM gated),
       |-- AudioChunker: block c releases on sample 32c+32; block ts =
       |-- trigger ts − 32·1000 // 1000
       |vol AS (SELECT a.pipe, t.ts - 32 AS ts_ms,
       |    sqrt((CAST(sum(a.v) AS DOUBLE) / 32767.0) / 32.0) AS value
       |  FROM (SELECT pipe, v, k // 32 AS blk FROM seqd) a
       |  JOIN seqd t ON t.pipe = a.pipe AND t.k = a.blk * 32 + 32
       |  GROUP BY a.pipe, a.blk, t.ts)
       |SELECT kind, container, ts_ms, value FROM (
       |  SELECT 'asr' AS kind, pipe AS container, ts_ms, value FROM asr
       |  UNION ALL
       |  SELECT 'vol', pipe, ts_ms, value FROM vol)
       |ORDER BY kind, container, ts_ms""".stripMargin
  }

  // ================================================== c14: the LIVE
  // ingest deployment — a stored artifact whose `inputcontainer` names
  // an rtmp:// URL (exactly what a streamtasks user types for a live
  // camera/encoder feed, inputcontainer.py:44-60), run against a
  // CAPTURED RTMP byte stream: per container the fixture PCM is packed
  // into 50-sample audio messages, muxed through the real chunk-stream
  // framing ([[graft.sources.Rtmp]], m31's wire layer), demuxed back
  // with header decompression, and the reassembled track feeds the
  // loaded volume-monitoring DAG. The oracle rebuilds the ENTIRE wire
  // stream in SQL — per-block fmt ladder (Type 0 start, Type 2 for the
  // first equal-length repeat since the Type-0 timestamp doubles as
  // the implied delta, Type 3 repeats, Type 1 for the short tail
  // block), header hex, PCM16LE payload hex — and md5-pins every byte
  // next to the recomputed meter blocks.

  /** Stored JSON: `inputcontainer` (source rtmp://ingest/live, one raw
    * s16 track at 1 kHz) → `audiovolumemeter` (time_window 125 ms) →
    * named output, all under the reference's config field names. */
  private val c14Json: String = s"""{
    "deployment": {"id": "00000000-0000-4000-8000-0000000000fb", "label": "c14"},
    "tasks": [
      ${storedTask(1, hostId("InputContainerTaskHost"), "live",
        """{"source": "rtmp://ingest/live", "real_time": false,
           "video_tracks": [],
           "audio_tracks": [{"sample_format": "s16", "codec": "raw",
             "channels": 1, "rate": 1000, "out_topic": 1}]}""",
        "", audioMeta(1))},
      ${storedTask(2, hostId("AudioVolumeMeterTaskHost"), "meter",
        """{"sample_format": "s16", "rate": 1000, "time_window": 125,
           "in_topic": 1, "out_topic": 2}""",
        audioMeta(1), numMeta(2))},
      ${storedTask(3, hostId("NamedOutputTaskHost"), "volume",
        """{"name": "volume", "in_topic": 2}""", numMeta(2), "")}
    ]}"""

  /** c14: load [[c14Json]], bind the rtmp track to samples demuxed
    * from real RTMP chunk-stream bytes built on the executors, run
    * the compiled DAG multi-pipeline (one meter instance per
    * container), and emit the volume blocks next to per-stream wire
    * accounting (byte length, fmt-3 chunk count, md5 over the hex
    * encoding — every framing byte under the hash gate). Scale: the
    * mux/demux is one mapGroups per container (bytes never leave the
    * executor); the meter machine keys by container. */
  private def c14(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.plans.{DeploymentJson, Pipeline}
    import graft.sources.Rtmp
    val loaded = DeploymentJson.load(c14Json, nodeName = Some(FixtureNode))
    val clicks = eventsMs(s, d).filter(col("event_type") === "click")
      .select((col("user_id") % 3).as("c"),
        least(greatest(round(col("value") * 100).cast(IntegerType),
          lit(-32768)), lit(32767)).as("x"),
        col("ts_ms"), col("event_id"))
      .as[(Long, Int, Long, Long)]
    val demuxed = clicks.groupByKey(_._1).flatMapGroups { (k, it) =>
      import graft.sources.Wav
      val xs = it.toArray.sortBy(r => (r._3, r._4)).map(_._2)
      // 50-sample PCM16LE messages on a 50 ms clock (1 kHz): the short
      // tail block exercises the fmt-1 leg of the compression ladder
      val msgs = xs.grouped(50).zipWithIndex.map { case (blk, b) =>
        Rtmp.RtmpMessage(4, 1L, Rtmp.TypeAudio, 50L * b, Wav.pcm16(blk))
      }.toSeq
      val bytes = Rtmp.mux(msgs)
      val (dec, stats) = Rtmp.demux(bytes)
      require(dec.size == msgs.size,
        s"rtmp round-trip message count on container $k")
      val md5 = md5Hex(bytes.map("%02x".format(_)).mkString.getBytes("UTF-8"))
      dec.iterator.flatMap { m =>
        Wav.samples16(m.payload).iterator.zipWithIndex.map { case (v, j) =>
          ("s", k, m.tsMs + j, v.toLong, null: String)
        }
      } ++ Iterator(("r", k, bytes.length.toLong, stats.fmt3, md5))
    }.toDF("kind", "c", "a", "b", "md5").cache()
    val samples = demuxed.filter(col("kind") === "s")
      .select(col("c").cast(StringType).as("pipe"), col("a").as("ts"),
        col("b").cast(DoubleType).as("value"),
        lit(null).cast(StringType).as("text"), lit(false).as("paused"),
        col("a").as("seq"))
    val ni = loaded.namedInputs
    val no = loaded.namedOutputs
    val streams = Pipeline.compile(loaded.deployment,
      Map(ni("rtmp://ingest/live#audio0") -> samples))
    val vol = streams(no("volume")).filter(!col("paused"))
      .select(lit("vol").as("kind"),
        col("pipe").cast(LongType).as("container"),
        col("ts").as("ts_ms"), col("value"), lit(125L).as("n"),
        lit(null).cast(StringType).as("md5"))
    val meta = demuxed.filter(col("kind") === "r")
      .select(lit("rtmp").as("kind"), col("c").as("container"),
        lit(0L).as("ts_ms"), col("b").cast(DoubleType).as("value"),
        col("a").as("n"), col("md5"))
    vol.unionByName(meta)
      .orderBy(col("kind"), col("container"), col("ts_ms"))
  }

  private val c14Sql =
    s"""WITH s AS (SELECT user_id % 3 AS c,
       |    least(greatest(CAST(round(value * 100) AS INT), -32768), 32767) AS x,
       |    ts_ms, event_id
       |  FROM ($evMs) WHERE event_type = 'click'),
       |idx AS (SELECT c, x,
       |    row_number() OVER (PARTITION BY c ORDER BY ts_ms, event_id) - 1 AS i
       |  FROM s),
       |n AS (SELECT c, count(*) AS nc FROM idx GROUP BY c),
       |-- AudioChunker at 1 kHz: block k covers samples [125k, 125k+125)
       |-- and releases only when sample 125k+125 ARRIVES, stamped at its
       |-- head sample's time (the c10 meter, gain 1.0 here)
       |vol AS (SELECT idx.c, (i // 125) * 125 AS ts_ms,
       |        sqrt(CAST(sum(abs(x)) AS DOUBLE) / 32767.0 / 125.0) AS value
       |      FROM idx JOIN n ON idx.c = n.c
       |      WHERE (i // 125) * 125 + 125 <= nc - 1
       |      GROUP BY idx.c, i // 125),
       |-- the wire stream: 50-sample PCM16LE messages on a 50 ms clock,
       |-- csid 4 / type 8 / stream id 1, single-chunk at size 128
       |blkhex AS (SELECT c, i // 50 AS b, count(*) AS bl,
       |        string_agg(printf('%02x%02x', ((x + 65536) % 65536) % 256,
       |          ((x + 65536) % 65536) // 256), '' ORDER BY i) AS phex
       |      FROM idx GROUP BY c, i // 50),
       |-- mux compression ladder: Type 0 start; short tail -> Type 1;
       |-- first equal-length repeat -> Type 2 (delta 50 differs from the
       |-- Type-0 timestamp 0, which doubles as the implied delta); then
       |-- Type 3
       |fmtb AS (SELECT *, CASE WHEN b = 0 THEN 0
       |          WHEN bl <> lag(bl) OVER w THEN 1
       |          WHEN b = 1 THEN 2 ELSE 3 END AS fmt
       |        FROM blkhex WINDOW w AS (PARTITION BY c ORDER BY b)),
       |rt AS (SELECT c,
       |        SUM(CASE WHEN fmt = 3 THEN 1 ELSE 0 END) AS f3,
       |        SUM(CASE fmt WHEN 0 THEN 12 WHEN 1 THEN 8 WHEN 2 THEN 4
       |            ELSE 1 END + 2 * bl) AS blen,
       |        md5(string_agg(
       |          CASE fmt
       |            WHEN 0 THEN '04000000' || printf('%06x', 2 * bl) || '0801000000'
       |            WHEN 1 THEN '44000032' || printf('%06x', 2 * bl) || '08'
       |            WHEN 2 THEN '84000032'
       |            ELSE 'c4' END || phex, '' ORDER BY b)) AS md5
       |      FROM fmtb GROUP BY c)
       |SELECT kind, container, ts_ms, value, n, md5 FROM (
       |  SELECT 'vol' AS kind, c AS container, CAST(ts_ms AS BIGINT) AS ts_ms,
       |         value, 125::BIGINT AS n, NULL::VARCHAR AS md5 FROM vol
       |  UNION ALL
       |  SELECT 'rtmp', c, 0, CAST(f3 AS DOUBLE), CAST(blen AS BIGINT), md5
       |  FROM rt)
       |ORDER BY kind, container, ts_ms""".stripMargin

  // ============================================= e51: LIVE INGEST on
  // the streaming engine — captured FLV segments ARRIVING AS FILES,
  // demuxed INSIDE the streaming plan. c14 proved the loaded rtmp
  // deployment against a captured byte stream demuxed batch-side;
  // here the bytes themselves are the stream: each container's
  // capture lands as two FLV segment files (executor-written, like a
  // live ingest dropping segments into a spool directory), a
  // binary-file source replays one segment generation per
  // micro-batch, the FLV demux + PCM explode run per batch in the
  // plan, and the loaded meter DAG's AudioChunker state crosses the
  // segment boundary (the split sits at sample 150, mid-way through
  // the [125,250) block, so the straddling chunk can only be emitted
  // from state carried across batches). Oracle: the meter blocks are
  // a pure function of the reassembled sample stream — c14's vol CTE.

  private def e51(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.plans.{DeploymentJson, Pipeline}
    import graft.sources.{Flv, Wav}
    val loaded = DeploymentJson.load(c14Json, nodeName = Some(FixtureNode))
    val clicks = eventsMs(s, d).filter(col("event_type") === "click")
      .select((col("user_id") % 3).as("c"),
        least(greatest(round(col("value") * 100).cast(IntegerType),
          lit(-32768)), lit(32767)).as("x"),
        col("ts_ms"), col("event_id"))
      .as[(Long, Int, Long, Long)]
    val tmpBase = if (new java.io.File("/dev/shm").isDirectory) "/dev/shm"
      else System.getProperty("java.io.tmpdir")
    val base = new java.io.File(
      s"$tmpBase/graft-e51-${System.nanoTime()}")
    val srcDir = new java.io.File(base, "src"); srcDir.mkdirs()
    val srcPath = srcDir.toString
    // executor-side segment writes — bytes never at the driver; a
    // single-box spool dir here, HDFS/S3 on a cluster
    clicks.groupByKey(_._1).mapGroups { (k, it) =>
      val xs = it.toArray.sortBy(r => (r._3, r._4)).map(_._2)
      val segs = Seq(xs.take(150), xs.drop(150)).filter(_.nonEmpty)
      segs.zipWithIndex.foreach { case (seg, si) =>
        val off = if (si == 0) 0L else 150L
        val tags = seg.grouped(50).zipWithIndex.map { case (blk, b) =>
          Flv.FlvTag(Flv.TagAudio, off + 50L * b, keyframe = true,
            Wav.pcm16(blk))
        }.toSeq
        val f = new java.io.File(srcPath, f"seg-$si%03d-c$k.flv")
        java.nio.file.Files.write(f.toPath, Flv.mux(tags))
      }
      k
    }.write.format("noop").mode("overwrite").save()
    // pin replay order: segment generation 0 (all containers) strictly
    // before generation 1 — the file source orders by mtime
    val files = Option(srcDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".flv")).sortBy(_.getName)
    require(files.nonEmpty, "e51: no FLV segments written")
    val t0 = System.currentTimeMillis() - 600000L
    files.foreach { f =>
      val gen = f.getName.drop(4).takeWhile(_ != '-').toInt
      f.setLastModified(t0 + gen * 1000L)
    }
    val perBatch = files.count(_.getName.startsWith("seg-000"))
    // isolated session (the throughStream convention): per-stream conf
    // never touches the shared batch session — and the conf is the
    // point: a 3-key state stream at the batch session's corpus-sized
    // shuffle width pays ~29 empty state-store tasks per micro-batch,
    // and no machine here arms event-time timers, so no-data batches
    // buy nothing
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    import org.apache.spark.sql.types.{StructType, StructField, StringType => SString, BinaryType => SBinary, LongType => SLong, TimestampType => STs}
    val binSchema = StructType(Seq(
      StructField("path", SString), StructField("modificationTime", STs),
      StructField("length", SLong), StructField("content", SBinary)))
    val bin = ss.readStream.format("binaryFile").schema(binSchema)
      .option("maxFilesPerTrigger", perBatch).load(srcPath)
      .select(col("path"), col("content"))
    // FLV demux + PCM explode INSIDE the streaming plan, per batch
    val env = bin.as[(String, Array[Byte])].flatMap { case (path, bytes) =>
      val name = path.substring(path.lastIndexOf('/') + 1)
      val c = name.substring(name.lastIndexOf("-c") + 2)
        .stripSuffix(".flv")
      val (_, _, tags) = Flv.demux(bytes)
      tags.iterator.filter(_.tagType == Flv.TagAudio).flatMap { t =>
        Wav.samples16(t.payload).iterator.zipWithIndex.map { case (v, j) =>
          (c, t.tsMs + j, v.toDouble, null: String, false, t.tsMs + j)
        }
      }
    }.toDF("pipe", "ts", "value", "text", "paused", "seq")
    val ni = loaded.namedInputs
    val no = loaded.namedOutputs
    val streams = Pipeline.compile(loaded.deployment,
      Map(ni("rtmp://ingest/live#audio0") -> env))
    val sink = new java.io.File(base, "sink").toString
    val q = streams(no("volume")).writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", new java.io.File(base, "ck").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // materialize before sweeping the spool/checkpoint dirs
    val out = graft.Resources.checkpoint(
      s.read.parquet(sink).filter(!col("paused"))
        .select(col("pipe").cast(LongType).as("container"),
          col("ts").as("ts_ms"), col("value"), lit(125L).as("n"))
        .orderBy(col("container"), col("ts_ms")))
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(base)
    out
  }

  private val e51Sql =
    s"""WITH s AS (SELECT user_id % 3 AS c,
       |    least(greatest(CAST(round(value * 100) AS INT), -32768), 32767) AS x,
       |    ts_ms, event_id
       |  FROM ($evMs) WHERE event_type = 'click'),
       |idx AS (SELECT c, x,
       |    row_number() OVER (PARTITION BY c ORDER BY ts_ms, event_id) - 1 AS i
       |  FROM s),
       |n AS (SELECT c, count(*) AS nc FROM idx GROUP BY c),
       |vol AS (SELECT idx.c, (i // 125) * 125 AS ts_ms,
       |        sqrt(CAST(sum(abs(x)) AS DOUBLE) / 32767.0 / 125.0) AS value
       |      FROM idx JOIN n ON idx.c = n.c
       |      WHERE (i // 125) * 125 + 125 <= nc - 1
       |      GROUP BY idx.c, i // 125)
       |SELECT c AS container, CAST(ts_ms AS BIGINT) AS ts_ms, value,
       |  125::BIGINT AS n
       |FROM vol ORDER BY container, ts_ms""".stripMargin

  // ============================================= e52: LIVE SOCKET
  // ingest — the reference's `rtmp://` URL mode END-TO-END: where c14
  // demuxed a captured byte stream batch-side and e51 replayed FLV
  // segments as files, here the bytes arrive over a REAL TCP loopback
  // connection: the harness replays the captured RTMP session through
  // a local server (997-byte slices, so chunks straddle reads), and
  // [[graft.sources.RtmpSocketSource]] — a DataSourceV2
  // MicroBatchStream — performs the §5.2 client handshake, runs the
  // incremental Dechunker over the arriving bytes, and serves the
  // assembled messages as rate-limited micro-batches (admission
  // control maxMsgsPerBatch). The PCM explode and the loaded meter
  // DAG run inside the streaming plan exactly as in e51; the oracle
  // is e51's — the meter blocks are a pure function of the
  // reassembled sample stream, however it traveled.

  private def e52(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.plans.{DeploymentJson, Pipeline}
    import graft.sources.{Rtmp, Wav}
    val loaded = DeploymentJson.load(c14Json, nodeName = Some(FixtureNode))
    val clicks = eventsMs(s, d).filter(col("event_type") === "click")
      .select((col("user_id") % 3).as("c"),
        least(greatest(round(col("value") * 100).cast(IntegerType),
          lit(-32768)), lit(32767)).as("x"),
        col("ts_ms"), col("event_id"))
      .as[(Long, Int, Long, Long)]
    val tmpBase = if (new java.io.File("/dev/shm").isDirectory) "/dev/shm"
      else System.getProperty("java.io.tmpdir")
    val base = new java.io.File(
      s"$tmpBase/graft-e52-${System.nanoTime()}")
    val capDir = new java.io.File(base, "cap"); capDir.mkdirs()
    val capPath = capDir.toString
    // executor-side capture: one chunk-stream segment per container on
    // its own csid (4 + c) and message stream id (c) — chunk streams
    // are independent, so concatenating per-csid segments is a valid
    // interleave of one session; bytes never visit the driver as rows.
    // LOCAL-MODE ASSUMPTION: tasks write into a driver-local directory
    // and the driver lists it — valid only because executors share the
    // driver's filesystem here. On a real cluster this capture leg
    // would collect the per-group mux bytes as rows (they are small:
    // this is the feed FIXTURE, not the measured path) or write to
    // shared storage; the 'no capture segments' require fails loudly
    // rather than silently feeding an empty session.
    clicks.groupByKey(_._1).mapGroups { (k, it) =>
      val xs = it.toArray.sortBy(r => (r._3, r._4)).map(_._2)
      val msgs = xs.grouped(50).zipWithIndex.map { case (blk, b) =>
        Rtmp.RtmpMessage(4 + k.toInt, k, Rtmp.TypeAudio, 50L * b,
          Wav.pcm16(blk))
      }.toSeq
      val f = new java.io.File(capPath, f"cap-c$k%03d.rtmp")
      java.nio.file.Files.write(f.toPath, Rtmp.mux(msgs))
      k
    }.write.format("noop").mode("overwrite").save()
    val files = Option(capDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".rtmp")).sortBy(_.getName)
    require(files.nonEmpty, "e52: no capture segments written")
    // loopback replay: handshake, then the session bytes in 997-byte
    // slices (chunks straddle socket reads), then close = end of feed
    val server = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    server.setSoTimeout(120000)
    val serverThread = new Thread(() => {
      try {
        val sk = server.accept()
        try {
          Rtmp.serverHandshake(sk.getInputStream, sk.getOutputStream)
          val os = sk.getOutputStream
          files.foreach { f =>
            val bytes = java.nio.file.Files.readAllBytes(f.toPath)
            var off = 0
            while (off < bytes.length) {
              val n = math.min(997, bytes.length - off)
              os.write(bytes, off, n); os.flush(); off += n
            }
          }
          os.flush()
        } finally sk.close()
      } finally server.close()
    }, "e52-rtmp-replay")
    serverThread.setDaemon(true); serverThread.start()
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val src = ss.readStream
      .format(classOf[graft.sources.RtmpSocketSource].getName)
      .option("host", "127.0.0.1")
      .option("port", server.getLocalPort.toString)
      .option("maxMsgsPerBatch", "64")
      .option("drainOnStart", "true")
      .load()
    // PCM explode INSIDE the streaming plan; pipe = message stream id
    val env = src.select(col("stream_id"), col("ts_ms"), col("payload"))
      .as[(Long, Long, Array[Byte])].flatMap { case (c, ts, payload) =>
        Wav.samples16(payload).iterator.zipWithIndex.map { case (v, j) =>
          (c.toString, ts + j, v.toDouble, null: String, false, ts + j)
        }
      }.toDF("pipe", "ts", "value", "text", "paused", "seq")
    val ni = loaded.namedInputs
    val no = loaded.namedOutputs
    val streams = Pipeline.compile(loaded.deployment,
      Map(ni("rtmp://ingest/live#audio0") -> env))
    val sink = new java.io.File(base, "sink").toString
    val q = streams(no("volume")).writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", new java.io.File(base, "ck").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = graft.Resources.checkpoint(
      s.read.parquet(sink).filter(!col("paused"))
        .select(col("pipe").cast(LongType).as("container"),
          col("ts").as("ts_ms"), col("value"), lit(125L).as("n"))
        .orderBy(col("container"), col("ts_ms")))
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(base)
    out
  }

  val all: Seq[Q] = Seq(
    Q("c01_calc_stateless", c01, Some(c01Sql)),
    Q("c02_calc_last_value", c02, Some(c02Sql)),
    Q("c03_calc_ternary", c03, Some(c03Sql)),
    Q("c04_calc_logic", c04, Some(c04Sql)),
    Q("c05_pipeline_dag", c05, Some(c05Sql)),
    Q("c06_streaming_pipeline", c06, Some(c05Sql)),
    Q("c07_multi_pipeline", c07, Some(c07Sql)),
    Q("c08_deployment_json", c08, Some(c08Sql)),
    Q("c09_deployment_stream", c09, Some(c09Sql)),
    Q("c10_media_deployment", c10, Some(c10Sql)),
    Q("c11_video_deployment", c11, Some(c11Sql)),
    Q("c12_audio_deployment", c12, Some(c12Sql)),
    Q("c13_inference_deployment", c13, Some(c13Sql)),
    Q("c14_live_deployment", c14, Some(c14Sql)),
    Q("e51_streaming_ingest", e51, Some(e51Sql)),
    Q("e52_socket_ingest", e52, Some(e51Sql)),
  )
}

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

  val all: Seq[Q] = Seq(
    Q("c01_calc_stateless", c01, Some(c01Sql)),
    Q("c02_calc_last_value", c02, Some(c02Sql)),
    Q("c03_calc_ternary", c03, Some(c03Sql)),
    Q("c04_calc_logic", c04, Some(c04Sql)),
    Q("c05_pipeline_dag", c05, Some(c05Sql)),
    Q("c06_streaming_pipeline", c06, Some(c05Sql)),
    Q("c07_multi_pipeline", c07, Some(c07Sql)),
  )
}

package graft

import graft.plans.{DeploymentJson, Pipeline}
import org.apache.spark.sql.SparkSession

/** The user-facing loop as a CLI: run a STORED streamtasks deployment
  * (the task_web.py JSON artifact — what `streamtasks export` leaves
  * on disk) against parquet-backed streams, no Scala authoring.
  *
  * {{{
  * runMain graft.RunDeployment <deployment.json> <outDir> \
  *   [--bind name=envelope.parquet ...] [--node nodeName]
  * }}}
  *
  *  - every named input (named-input tasks, pulse-generator ticks,
  *    input-container tracks as `<source>#<kind><idx>`, and
  *    synthesized external topics) must be bound to an envelope
  *    parquet: columns (ts LONG, value DOUBLE, text STRING,
  *    paused BOOLEAN, seq LONG) plus an optional `pipe` STRING for
  *    multi-pipeline runs;
  *  - `--node` enables the reference's hash task_host_id resolution
  *    (task.py:153) for real exports; loader-friendly exports with
  *    plain kind names need nothing;
  *  - every named output is written to `outDir/<name>.parquet` and a
  *    one-line JSON summary of row counts goes to stdout.
  *
  * Batch semantics (the hash-gated engine path); the streaming branch
  * of the same compile is driven by [[graft.plans.PipelineManager]]
  * (checkpoints, start/stop/status) — see PipelineSpec's lifecycle
  * tests and the c09/e50 mounts.
  */
object RunDeployment {
  def main(args: Array[String]): Unit = {
    val positional = Vector.newBuilder[String]
    val bindsB = Map.newBuilder[String, String]
    var nodeName: Option[String] = None
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--bind" =>
          require(i + 1 < args.length && args(i + 1).contains('='),
            "--bind takes name=path")
          val Array(n, p) = args(i + 1).split("=", 2)
          bindsB += n -> p; i += 2
        case "--node" =>
          require(i + 1 < args.length, "--node takes a node name")
          nodeName = Some(args(i + 1)); i += 2
        case a => positional += a; i += 1
      }
    }
    val pos = positional.result()
    require(pos.length == 2,
      "usage: RunDeployment <deployment.json> <outDir> " +
        "[--bind name=path ...] [--node nodeName]")
    val Vector(jsonPath, outDir) = pos
    val binds = bindsB.result()

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // embeddable: reuse a live session (tests, notebooks) and leave
    // its lifecycle to the owner; stop only a session we created
    val preExisting = SparkSession.getDefaultSession.isDefined
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(jsonPath)), "UTF-8")
    val loaded = DeploymentJson.load(json, nodeName = nodeName)
    val missing = loaded.namedInputs.keySet.diff(binds.keySet)
    require(missing.isEmpty,
      s"unbound named inputs: ${missing.toSeq.sorted.mkString(", ")} — " +
        "pass --bind <name>=<envelope.parquet> for each")
    val sources = loaded.namedInputs.map { case (name, stream) =>
      stream -> spark.read.parquet(binds(name))
    }
    val streams = Pipeline.compile(loaded.deployment, sources)
    val counts = loaded.namedOutputs.toSeq.sortBy(_._1).map {
      case (name, stream) =>
        val path = s"$outDir/$name.parquet"
        streams(stream).write.mode("overwrite").parquet(path)
        name -> spark.read.parquet(path).count()
    }
    println(counts.map { case (n, c) => s""""$n":$c""" }
      .mkString("""{"deployment":"""" + loaded.deployment.name +
        """","outputs":{""", ",", "}}"))
    if (!preExisting) spark.stop()
  }
}

package graft

import graft.plans.{DeploymentJson, Pipeline}
import graft.plans.Pipeline._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property: ANY valid deployment built from the stored-shape op set
  * survives spec → JSON → spec as a JSON fixpoint, and the reloaded
  * deployment still validates. Random DAGs cover the corners the
  * hand-written PipelineSpec fixtures don't: multi-output synchronizer
  * wiring, fan-out (one stream consumed by several tasks), every
  * writable op kind, defaulted vs non-defaulted configs. */
class DeploymentJsonPropSpec extends AnyFunSuite {

  private val genOpWithArity: Gen[(String, Seq[String] => Int => Op, Int, Int)] =
    Gen.oneOf(
      ("gate", (_: Seq[String]) => (_: Int) => GateOp(), 2, 1),
      ("gateOpen", (_: Seq[String]) => (_: Int) => GateOp(failOpen = true), 2, 1),
      ("latch", (_: Seq[String]) => (_: Int) => SrLatchOp, 2, 1),
      ("cat", (_: Seq[String]) => (_: Int) => StringConcatenatorOp, 2, 1),
      ("det", (_: Seq[String]) => (_: Int) => MessageDetectorOp(750L), 1, 1),
      ("tbuf", (_: Seq[String]) => (_: Int) => TimeBufferOp(42L), 1, 1),
      ("n2t", (_: Seq[String]) => (_: Int) => NumberToTextOp, 1, 1),
      ("tsu", (_: Seq[String]) => (_: Int) => TimestampUpdaterOp(-5L), 1, 1),
      ("t2t", (_: Seq[String]) => (_: Int) => TimeToTextOp("%H:%M"), 1, 1),
      ("sm", (_: Seq[String]) => (_: Int) => StringMatcherOp("a+b"), 1, 1),
      ("rep", (_: Seq[String]) => (_: Int) => RepeaterOp, 2, 1),
      ("rb", (_: Seq[String]) => (_: Int) => ReplayBufferOp(), 2, 1),
      ("sw", (_: Seq[String]) => (_: Int) => SwitchOp(2), 4, 1),
      ("msw", (_: Seq[String]) => (_: Int) => MediaSwitchOp(2), 4, 1),
      ("oc", (_: Seq[String]) => (_: Int) => OutputContainerOp(Seq(
        graft.streaming.StateMachines.OcStreamCfg(1, 30, 1, "video0"),
        graft.streaming.StateMachines.OcStreamCfg(1, 32000, 1024, "audio0")),
        maxDesync = 100L), 2, 1),
      ("sync2", (_: Seq[String]) => (_: Int) => SynchronizerOp(2), 2, 2),
      ("sync3", (_: Seq[String]) => (_: Int) => SynchronizerOp(3), 3, 3),
      ("calc",
        (vars: Seq[String]) => (_: Int) =>
          CalculatorOp("a + b * 2", Seq("a", "b"), Map("b" -> 1.5)), 2, 1),
      ("fmt",
        (_: Seq[String]) => (_: Int) =>
          TextFormatterOp("{x}/{y}", Seq("x", "y")), 2, 1))

  /** Grow a random DAG: start from sources, append ops wired to
    * randomly chosen existing streams. IOMeta compatibility is
    * sidestepped by typeless sources (Map("type" -> "ts") matches any
    * input meta on the shared key). */
  private val genDeployment: Gen[Deployment] = for {
    nSrc <- Gen.choose(2, 4)
    nOps <- Gen.choose(1, 7)
    picks <- Gen.listOfN(nOps, genOpWithArity)
    seed <- Gen.choose(0, Int.MaxValue)
  } yield {
    val rnd = new scala.util.Random(seed)
    val meta = IOMeta(Map("type" -> "ts"))
    var streams = (0 until nSrc).map(i => s"s$i").toVector
    var streamMeta = streams.map(_ -> meta).toMap
    val sources = streams.map(s0 =>
      TaskSpec(s"src_$s0", SourceOp(meta), Nil, s0))
    var id = 0
    val ops = picks.map { case (kindName, mk, _, outN) =>
      id += 1
      val op = mk(Nil)(id)
      // wire each input from a META-COMPATIBLE existing stream (the
      // typeless sources qualify for every input, so one always exists)
      val ins = op.inMeta.map { need =>
        val ok = streams.filter(s0 =>
          streamMeta(s0).compatibleWith(need).isEmpty)
        ok(rnd.nextInt(ok.size))
      }
      val outs = (0 until outN).map(j => s"o${id}_$j")
      streams ++= outs
      streamMeta ++= outs.zip(op.outMetas)
      TaskSpec(s"${kindName}_$id", op, ins, outs)
    }
    Deployment("prop", sources ++ ops)
  }

  test("write -> load -> write is a JSON fixpoint and the reload " +
      "validates, for random DAGs over the whole writable op set") {
    val prop = Prop.forAll(genDeployment) { dep =>
      Pipeline.validate(dep).isEmpty && {
        val json = DeploymentJson.write(dep)
        val loaded = DeploymentJson.load(json)
        DeploymentJson.write(loaded.deployment) == json &&
          Pipeline.validate(loaded.deployment).isEmpty &&
          loaded.deployment.tasks.size == dep.tasks.size &&
          // op parameters survive (names match task-by-task)
          loaded.deployment.tasks.map(_.op) == dep.tasks.map(_.op)
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("kind-name task_host_ids and hash task_host_ids load the same " +
      "deployment") {
    val dep = Deployment("h", Seq(
      TaskSpec("s", SourceOp(IOMeta.number), Nil, "a"),
      TaskSpec("c", SourceOp(IOMeta.number), Nil, "p"),
      TaskSpec("g", GateOp(), Seq("a", "p"), "o")))
    val json = DeploymentJson.write(dep)
    // swap kind names for the reference's node hashes
    val node = "prop-node"
    val hashed = DeploymentJson.hostClasses.foldLeft(json) {
      case (j, (kind, cls)) =>
        j.replace("\"task_host_id\":\"" + kind + "\"",
          "\"task_host_id\":\"" + DeploymentJson.taskHostId(cls, node) + "\"")
    }
    val a = DeploymentJson.load(json)
    val b = DeploymentJson.load(hashed, nodeName = Some(node))
    assert(a.deployment == b.deployment)
  }
}

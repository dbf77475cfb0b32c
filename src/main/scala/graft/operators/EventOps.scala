package graft.operators
import graft.Q
object EventOps {
  val all: Seq[Q] = Seq()
}

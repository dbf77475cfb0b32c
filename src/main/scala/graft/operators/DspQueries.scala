package graft.operators
import graft.Q
object DspQueries {
  val all: Seq[Q] = Seq()
}

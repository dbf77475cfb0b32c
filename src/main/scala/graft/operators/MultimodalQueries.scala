package graft.operators
import graft.Q
object MultimodalQueries {
  val all: Seq[Q] = Seq()
}

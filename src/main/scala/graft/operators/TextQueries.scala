package graft.operators
import graft.Q
object TextQueries {
  val all: Seq[Q] = Seq()
}

package graft.operators
import graft.Q
object CalcQueries {
  val all: Seq[Q] = Seq()
}

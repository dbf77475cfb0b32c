package graft.operators
import graft.Q
object DedupQueries {
  val all: Seq[Q] = Seq()
}

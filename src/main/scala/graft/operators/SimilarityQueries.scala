package graft.operators
import graft.Q
object SimilarityQueries {
  val all: Seq[Q] = Seq()
}

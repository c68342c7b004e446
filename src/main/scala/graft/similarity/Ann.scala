package graft.similarity
import graft.GQuery
object Ann {
  def all: Seq[GQuery] = Seq.empty
}

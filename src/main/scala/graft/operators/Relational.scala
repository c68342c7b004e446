package graft.operators
import graft.GQuery
object Relational {
  def all: Seq[GQuery] = Seq.empty
}

package graft.dedup
import graft.GQuery
object Dedup {
  def all: Seq[GQuery] = Seq.empty
}

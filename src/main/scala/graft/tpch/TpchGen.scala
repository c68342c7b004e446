package graft.tpch
import graft.GQuery
object TpchGen {
  def all: Seq[GQuery] = Seq.empty
}

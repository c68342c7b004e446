package graft.multimodal
import graft.GQuery
object Multimodal {
  def all: Seq[GQuery] = Seq.empty
}

package graft.text
import graft.GQuery
object TextAnalysis {
  def all: Seq[GQuery] = Seq.empty
}

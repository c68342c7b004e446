package graft.streaming
import graft.GQuery
object Streams {
  def all: Seq[GQuery] = Seq.empty
}

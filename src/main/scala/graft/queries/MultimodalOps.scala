package graft.queries

object MultimodalOps {
  def queries: Seq[Q] = Seq()
}

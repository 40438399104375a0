package graft.queries

object DedupOps {
  def queries: Seq[Q] = Seq()
}

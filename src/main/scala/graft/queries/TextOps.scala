package graft.queries

object TextOps {
  def queries: Seq[Q] = Seq()
}

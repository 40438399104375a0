package graft.queries

object VectorOps {
  def queries: Seq[Q] = Seq()
}

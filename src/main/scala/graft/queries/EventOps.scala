package graft.queries

object EventOps {
  def queries: Seq[Q] = Seq()
}

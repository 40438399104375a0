package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark body plus (when SQL-expressible) an
  * equivalent ANSI-SQL oracle the driver runs in DuckDB over the same
  * parquet tables (CORRECTNESS gate — see the builder contract).
  *
  * Column names in `run` output and `oracle` MUST match: the driver sorts
  * columns by name before hashing values.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Registry {
  /** Complete inventory; SparkEntry derives its maps from this. */
  def all: Seq[Q] =
    TpchLike.queries ++ EventOps.queries ++ TextOps.queries ++
      VectorOps.queries ++ DedupOps.queries ++ DedupFusionOps.queries ++
      PipelineOps.queries ++ MultimodalOps.queries ++
      KnnGraphOps.queries ++ graft.reference.RefQueries.queries

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

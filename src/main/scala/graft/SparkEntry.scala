package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{Q, Relational, TextQueries, DedupQueries, AnnQueries, KgQueries, GraphQueries, MmQueries, CurationQueries, StreamQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the oracle-checked operator registry; each entry
  * has a DuckDB-equivalent SQL in `oracleSql` unless the operator is not
  * SQL-expressible (then the driver records a rows-only check).
  */
object SparkEntry {

  private def registry: Seq[Q] =
    Relational.all ++ TextQueries.all ++ DedupQueries.all ++ AnnQueries.all ++
      GraphQueries.all ++ KgQueries.all ++ MmQueries.all ++ CurationQueries.all ++ StreamQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full KG-construction pipeline (spans → parse → analyze cascade →
    * triples) at sf0.001 scale. */
  def entry(spark: SparkSession): DataFrame =
    KgQueries.all.find(_.name == "kg_pipeline_analyze").get
      .run(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. ListMap preserves
    * registry order, so Bench/Verify run entries in the same sequence
    * every round — with a hashed Map the cold-vs-warm position of each
    * entry reshuffled whenever the registry grew, which read as
    * phantom per-entry regressions between rounds. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(registry.map(q => q.name -> q.run): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    scala.collection.immutable.ListMap(
      registry.flatMap(q => q.oracle.map(o => q.name -> o)): _*)
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-verifiable query: a Spark implementation plus (optionally) the
  * equivalent ANSI SQL that DuckDB runs on the same parquet tables.
  * Column names and row order must match exactly between the two —
  * the driver sorts columns by name and hashes values.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

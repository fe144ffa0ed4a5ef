package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated test data.
  *
  * All tables are read lazily; Catalyst pushes filters/projections into the
  * parquet scan (verify with `.explain`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, dir: String): DataFrame  = t(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame    = t(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame  = t(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = t(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = t(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame    = t(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame    = t(s, dir, "region")
  def events(s: SparkSession, dir: String): DataFrame    = t(s, dir, "events")
  def documents(s: SparkSession, dir: String): DataFrame = t(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")
}

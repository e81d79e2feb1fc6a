package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table readers for the synthetic star schema (TESTDATA.md).
  *
  * Mirrors the reference's source surface (SURVEY.md §2.1 S1-S10): the
  * reference moves CSV/Parquet/JSONEachRow files between ClickHouse, GCS
  * and local disk (`clickhouse/v1/bash_hook.py:190-305`,
  * `clickhouse/v1/operator.py:56-351`); in Spark every one of those hops
  * collapses into `spark.read.<fmt>` / `df.write.<fmt>` against the
  * appropriate filesystem scheme (file://, gs://, s3a://). Column
  * pruning and predicate pushdown reach the parquet scan automatically.
  */
object Tables {
  private def p(dir: String, name: String) = s"$dir/$name.parquet"

  def region(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "region"))
  def nation(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "nation"))
  def customer(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "customer"))
  def supplier(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "supplier"))
  def part(s: SparkSession, dir: String): DataFrame     = s.read.parquet(p(dir, "part"))
  def orders(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "orders"))
  def lineitem(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "lineitem"))
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "documents"))
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "embeddings"))

  /** events.ts is parquet TIMESTAMP(NANOS) — illegal for Spark's µs
    * timestamps. We read it as LongType nanos
    * (spark.sql.legacy.parquet.nanosAsLong) and expose both the raw
    * nanos (`ts_ns`) and a truncated-to-µs proper timestamp (`ts`). */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // integral div — double division loses integer precision at
    // epoch-nanos magnitudes (~1.7e18 > 2^53; ±128 ns rounding could
    // shift a boundary event into the previous microsecond/day)
    s.read.parquet(p(dir, "events"))
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view so `spark.sql` works against the
    * same namespace the DuckDB oracle sees. */
  def registerAll(s: SparkSession, dir: String): Unit = names.foreach {
    case "events" => events(s, dir).createOrReplaceTempView("events")
    case n        => s.read.parquet(p(dir, n)).createOrReplaceTempView(n)
  }
}

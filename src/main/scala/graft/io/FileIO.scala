package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** S1-S10 file-format surface (SURVEY.md §2.1).
  *
  * The reference moves data as three wire formats — `CSVWithNames`
  * (header CSV), `Parquet`, `JSONEachRow` (newline-delimited JSON) —
  * between ClickHouse, GCS, S3 and local disk
  * (`clickhouse/v1/bash_hook.py:209-276`, `connector.py:113-117`).
  * Every hop is a `spark.read`/`df.write` against the appropriate
  * filesystem scheme; the format names map 1:1:
  *
  *   CSVWithNames → csv + header=true, Parquet → parquet,
  *   JSONEachRow  → json (Spark's JSON source IS newline-delimited)
  *
  * Explicit schemas are preferred (SURVEY.md §1.2); `inferSchema`
  * remains available for reference parity with pandas' CSV inference.
  */
object FileIO {

  sealed trait WireFormat { def name: String }
  case object CsvWithNames extends WireFormat { val name = "csv" }
  case object ParquetFmt extends WireFormat { val name = "parquet" }
  case object JsonEachRow extends WireFormat { val name = "json" }
  /** Beyond the reference's three wire formats: ORC, the other columnar
    * format Spark ships natively — same pushdown/pruning properties as
    * parquet, so warehouse-resident ORC corpora are first-class inputs. */
  case object OrcFmt extends WireFormat { val name = "orc" }

  def fromName(s: String): WireFormat = s.toLowerCase match {
    case "csv" | "csvwithnames"  => CsvWithNames
    case "parquet"               => ParquetFmt
    case "json" | "jsoneachrow"  => JsonEachRow
    case "orc"                   => OrcFmt
    case other => throw new IllegalArgumentException(
      s"unsupported file format: $other") // connector.py:168-171 analog
  }

  def write(df: DataFrame, path: String, format: WireFormat,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    format match {
      case CsvWithNames => w.option("header", "true").csv(path)
      case ParquetFmt   => w.parquet(path)
      case JsonEachRow  => w.json(path)
      case OrcFmt       => w.orc(path)
    }
  }

  def read(spark: SparkSession, path: String, format: WireFormat,
      schema: Option[StructType] = None): DataFrame = format match {
    case CsvWithNames =>
      val r = spark.read.option("header", "true")
      schema.map(r.schema).getOrElse(r.option("inferSchema", "true")).csv(path)
    case ParquetFmt => spark.read.parquet(path)
    case JsonEachRow =>
      val r = spark.read
      schema.map(r.schema).getOrElse(r).json(path)
    case OrcFmt => spark.read.orc(path)
  }
}

package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** S11/S15 — multi-statement SQL execution, and S18/S19-style broadcast
  * lookup dimensions (SURVEY.md §2.1).
  *
  * The reference splits scripts on `;` and executes each statement
  * (`ClickhouseExecuteOperator`, `clickhouse/v1/operator.py:354-380`;
  * `run_bigquery_sqls`, `airflow/bigquery/utils.py:86-111`); its REST
  * price source materializes a tiny symbol→price frame that every join
  * broadcasts (`coinprice/utils.py:20-32`).
  */
object SqlRunner {

  /** Execute every non-empty `;`-separated statement; returns the result
    * of the last one (DDL statements return empty frames). */
  def executeAll(spark: SparkSession, script: String): Seq[DataFrame] =
    script.split(";").map(_.trim).filter(_.nonEmpty).toSeq
      .map(spark.sql)

  /** S18 analog: a driver-side fetched lookup (e.g. REST prices) as a
    * broadcast-hinted dimension frame. */
  def broadcastLookup(
      spark: SparkSession,
      rows: Seq[(String, Double)],
      keyName: String, valueName: String): DataFrame = {
    import spark.implicits._
    broadcast(rows.toDF(keyName, valueName))
  }
}

package graft.io

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.util.LongAccumulator

/** Sink surface (SURVEY.md §2.1 S2/S17, §2.11 V4).
  *
  * File sinks collapse to `df.write` (S1-S10); the one genuinely custom
  * sink in the reference is the TigerGraph loading job: CSV batches of
  * ≤10k rows POSTed per request, with load-statistics validation
  * (`tigergraph/v1/utils.py:57-128`, `tigergraph/utils.py:18-56`).
  *
  * Spark realization: `foreachPartition` with an injectable poster —
  * executors stream batches concurrently (the reference is single-
  * threaded), accumulators carry the load stats back to the driver, and
  * validation mirrors the reference's 8 error classes. The poster is a
  * function so tests exercise the batching/stats machinery without a
  * network.
  */
object Sinks {

  /** Result of one batch POST — the subset of TG load stats the
    * reference validates (`tigergraph/v1/utils.py:83-112`). */
  final case class LoadStats(
      validLines: Long, rejectLines: Long, failedConditionLines: Long,
      invalidJson: Long, oversizeToken: Long, notEnoughToken: Long,
      invalidAttributes: Long)

  final case class SinkReport(rowsSent: Long, batchesSent: Long,
      validLines: Long, errorLines: Long) {
    def allValid: Boolean = errorLines == 0 && validLines == rowsSent
  }

  /** Serialize rows to CSV lines (header-free batch body, `sep=,` /
    * `eol=\n` exactly as the TG loading job expects). */
  def toCsvLine(row: Row): String =
    (0 until row.length).map { i =>
      val v = row.get(i)
      if (v == null) ""
      else {
        val s = v.toString
        if (s.contains(",") || s.contains("\"") || s.contains("\n"))
          "\"" + s.replace("\"", "\"\"") + "\""
        else s
      }
    }.mkString(",")

  /** Batched push sink: ≤ `batchSize` rows per call to `post`.
    * `post` runs on executors — it must be serializable and thread-safe
    * across partitions (each partition posts its own batches). */
  def batchedPush(
      df: DataFrame,
      batchSize: Int,
      post: Seq[String] => LoadStats): SinkReport = {
    val spark = df.sparkSession
    val rows = spark.sparkContext.longAccumulator("rowsSent")
    val batches = spark.sparkContext.longAccumulator("batchesSent")
    val valid = spark.sparkContext.longAccumulator("validLines")
    val errors = spark.sparkContext.longAccumulator("errorLines")
    df.foreachPartition { it: Iterator[Row] =>
      it.grouped(batchSize).foreach { group =>
        val lines = group.map(toCsvLine)
        val stats = post(lines)
        rows.add(lines.size)
        batches.add(1)
        valid.add(stats.validLines)
        errors.add(stats.rejectLines + stats.failedConditionLines +
          stats.invalidJson + stats.oversizeToken + stats.notEnoughToken +
          stats.invalidAttributes)
      }
    }
    SinkReport(rows.value, batches.value, valid.value, errors.value)
  }
}

package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.broadcast
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S20 — Google Sheets source/sink (reference:
  * `dataengineering/coinprice/utils.py:76-187`, class `GoogleSheets`).
  *
  * A spreadsheet is a tiny curated dimension (the grid itself caps at
  * ~10M cells), so it enters the engine as a driver-fetched,
  * broadcast-hinted DataFrame — the same regime as the REST price
  * lookup (S18) — and leaves it as a bounded driver-side collect.
  * Nothing here ever becomes a distributed scan.
  *
  * The HTTP surface is injectable ([[SheetsTransport]]): this
  * environment has no Google client libraries and no egress, and the
  * reference's own tests mock the transport the same way
  * (`responses`-style). The retry policy, ranges, header handling,
  * row-width filtering, append stringification and clear semantics are
  * all implemented HERE, faithful to the reference:
  *
  *  - `getData(gid)`: range `title!A1:<colLetters(columnCount)>`; first
  *    row is the header; retries 429/503/500 up to 5 attempts, then
  *    returns `(false, empty)`; other HTTP errors propagate.
  *  - `getDataFixedRows(gid, cols, startCol, endCol, readRowsFrom)`:
  *    reads `title!<startCol><readRowsFrom>:<endCol>` only when the
  *    sheet has that many rows; keeps only rows exactly as wide as the
  *    requested column span; retries 429 only.
  *  - `appendDataFrame(df, gid, columnTill)`: RAW value append at
  *    `title!A1:...` with every cell stringified (the reference's
  *    `oid_to_str` + `values.tolist()`).
  *  - `clearSheet(gid, columnTill)`: `batchClear` from `A2` — the
  *    header row always survives.
  */
object Sheets {

  /** One sheet (tab) inside a spreadsheet, as returned by the
    * spreadsheet-properties call. */
  final case class SheetProperties(
      sheetId: Long, title: String, rowCount: Int, columnCount: Int)

  /** HTTP error carrying the status the retry policy dispatches on. */
  final case class SheetsHttpError(status: Int)
      extends RuntimeException(s"Sheets HTTP $status")

  /** The four REST calls the reference uses; implement against the real
    * Sheets v4 API in deployment, or a recording fake in tests. */
  trait SheetsTransport {
    def properties(spreadsheetId: String): Seq[SheetProperties]
    /** `values.get` — `None` when the range has no values. */
    def getValues(spreadsheetId: String, range: String): Option[Seq[Seq[String]]]
    /** `values.append` with RAW input option. */
    def append(spreadsheetId: String, range: String, values: Seq[Seq[String]]): Unit
    /** `values.batchClear`. */
    def batchClear(spreadsheetId: String, range: String): Unit
  }

  /** Spreadsheet column letters: 1 → A, 26 → Z, 27 → AA, 703 → AAA
    * (reference `column_string`, utils.py:215-221). */
  def columnLetters(n: Int): String = {
    require(n > 0, s"column index must be positive, got $n")
    var m = n
    val sb = new StringBuilder
    while (m > 0) {
      val rem = (m - 1) % 26
      sb.insert(0, ('A' + rem).toChar)
      m = (m - 1) / 26
    }
    sb.toString
  }

  /** Inverse of [[columnLetters]]: "A" → 1, "AA" → 27. (The reference
    * does single-letter `ord` arithmetic, which silently breaks past
    * column Z; this parses the general case.) */
  def letterIndex(s: String): Int = {
    require(s.nonEmpty && s.forall(c => c >= 'A' && c <= 'Z'),
      s"column letters must be A-Z, got '$s'")
    s.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1))
  }

  private val retryableGet = Set(429, 503, 500)
  private val maxTries = 5
  private val retrySleepMs = 5000L
}

/** Connector bound to one spreadsheet. `sleeper` injects the
  * reference's inter-call throttle (5 s between retries, 2 s after each
  * read) so tests run instantly. */
class Sheets(
    spark: SparkSession,
    spreadsheetId: String,
    transport: Sheets.SheetsTransport,
    sleeper: Long => Unit = Thread.sleep) {
  import Sheets._

  /** Spreadsheet tab inventory, fetched once like the reference ctor. */
  val sheetProperties: Seq[SheetProperties] = transport.properties(spreadsheetId)

  private def sheet(gid: Long): SheetProperties =
    sheetProperties.find(_.sheetId == gid).getOrElse(
      sys.error(s"no sheet with gid $gid in $spreadsheetId"))

  private def toDf(cols: Seq[String], rows: Seq[Seq[String]]): DataFrame = {
    val schema = StructType(cols.map(StructField(_, StringType)))
    val padded = rows.map(r =>
      Row.fromSeq(r.padTo(cols.length, null).take(cols.length)))
    broadcast(spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(padded).asJava), schema))
  }

  /** Whole-tab read, header row → column names. `(false, empty)` after
    * five retryable failures; non-retryable HTTP errors propagate. */
  def getData(gid: Long): (Boolean, DataFrame) = {
    val s = sheet(gid)
    val range = s"${s.title}!A1:${columnLetters(s.columnCount)}"
    var tries = 1
    var data: Option[Seq[Seq[String]]] = null
    while (tries <= maxTries && data == null) {
      try data = transport.getValues(spreadsheetId, range)
      catch {
        case SheetsHttpError(st) if retryableGet(st) =>
          tries += 1
          if (tries <= maxTries) sleeper(retrySleepMs)
      }
    }
    if (data == null) return (false, spark.emptyDataFrame)
    sleeper(2000L)
    data.filter(_.nonEmpty) match {
      case Some(rows) => (true, toDf(rows.head, rows.tail))
      case None => (true, spark.emptyDataFrame)
    }
  }

  /** Fixed-schema ranged read starting at `readRowsFrom`; rows narrower
    * or wider than the `startCol..endCol` span are dropped (partially
    * filled sheet tails). Always returns the requested schema, possibly
    * empty. Retries 429 only, like the reference. */
  def getDataFixedRows(
      gid: Long, columnList: Seq[String], startCol: String, endCol: String,
      readRowsFrom: Int): DataFrame = {
    val s = sheet(gid)
    val width = letterIndex(endCol) - letterIndex(startCol) + 1
    require(width == columnList.length,
      s"columnList has ${columnList.length} names for a $width-column span")
    val data: Option[Seq[Seq[String]]] =
      if (s.rowCount >= readRowsFrom) {
        val range = s"${s.title}!$startCol$readRowsFrom:$endCol"
        var tries = 0
        var got: Option[Seq[Seq[String]]] = null
        while (tries < maxTries && got == null) {
          try got = transport.getValues(spreadsheetId, range)
          catch {
            case SheetsHttpError(429) =>
              tries += 1
              if (tries < maxTries) sleeper(retrySleepMs)
          }
        }
        if (got == null) None else got
      } else None
    sleeper(2000L)
    val rows = data.map(_.filter(_.length == width)).getOrElse(Nil)
    toDf(columnList, rows)
  }

  /** RAW append of the frame's rows (stringified, nulls as empty) at
    * `title!A1:<columnTill|columnCount>` — the API appends after the
    * last non-empty row of that range.
    *
    * Sheets is a driver-side sink by nature (the grid itself caps at
    * 10M CELLS per spreadsheet), so the collect is inherently bounded —
    * but an unguarded `df.collect()` on an accidentally-huge frame would
    * OOM the driver long before the API rejected it. The collect is
    * therefore capped: the effective row cap is
    * `min(maxRows, maxCells / columns)` — a CELL budget, because a
    * 200-column frame blows the ~10M-cell grid limit long before a pure
    * row cap would fire — `limit(cap + 1)` bounds what ever reaches the
    * driver, and one extra row beyond the cap fails fast with a clear
    * message instead of half-appending. */
  def appendDataFrame(
      df: DataFrame, gid: Long, columnTill: Option[String] = None,
      maxRows: Int = 100000, maxCells: Long = 5000000L): Unit = {
    val s = sheet(gid)
    val range =
      s"${s.title}!A1:${columnTill.getOrElse(columnLetters(s.columnCount))}"
    val cols = math.max(1, df.columns.length)
    val rowCap = math.min(maxRows.toLong, maxCells / cols).toInt
    require(rowCap > 0,
      s"appendDataFrame: $cols columns exceed the maxCells=$maxCells " +
      "budget before a single row fits")
    val collected = df.limit(rowCap + 1).collect()
    require(collected.length <= rowCap,
      s"appendDataFrame: input exceeds the cap of $rowCap rows " +
      s"(min of maxRows=$maxRows and maxCells=$maxCells / $cols columns; " +
      "a spreadsheet holds at most ~10M cells); aggregate or sample " +
      "before appending, or raise the caps explicitly")
    val values = collected.toSeq.map(_.toSeq.map {
      case null => ""
      case v => v.toString
    })
    transport.append(spreadsheetId, range, values)
  }

  /** Clear data rows from `A2` down — the header row survives. */
  def clearSheet(gid: Long, columnTill: Option[String] = None): Unit = {
    val s = sheet(gid)
    val range =
      s"${s.title}!A2:${columnTill.getOrElse(columnLetters(s.columnCount))}"
    transport.batchClear(spreadsheetId, range)
  }
}

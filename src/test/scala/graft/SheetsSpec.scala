package graft

import graft.io.Sheets
import graft.io.Sheets.{SheetProperties, SheetsHttpError, SheetsTransport}
import scala.collection.mutable.ArrayBuffer

/** S20 — mocked-transport spec, the reference's own test pattern
  * (`responses`-style mocking in `tests/test_airflow_utils.py`). */
class SheetsSpec extends SparkSpec {

  private val props = Seq(
    SheetProperties(0L, "prices", rowCount = 100, columnCount = 3),
    SheetProperties(77L, "wide", rowCount = 5, columnCount = 28))

  /** Recording fake: scripted per-call outcomes, captured requests. */
  private class Fake(
      script: Seq[Either[Int, Option[Seq[Seq[String]]]]] = Nil)
      extends SheetsTransport {
    val getRanges = ArrayBuffer[String]()
    val appends = ArrayBuffer[(String, Seq[Seq[String]])]()
    val clears = ArrayBuffer[String]()
    private var i = 0
    override def properties(id: String): Seq[SheetProperties] = props
    override def getValues(id: String, range: String) = {
      getRanges += range
      val step = if (i < script.length) script(i) else Right(None)
      i += 1
      step match {
        case Left(status) => throw SheetsHttpError(status)
        case Right(v) => v
      }
    }
    override def append(id: String, range: String, values: Seq[Seq[String]]): Unit =
      appends += ((range, values))
    override def batchClear(id: String, range: String): Unit = clears += range
  }

  private val sleeps = ArrayBuffer[Long]()
  private def sheets(fake: Fake) =
    new Sheets(spark, "sheet-1", fake, sleeper = sleeps += _)

  test("column letters round-trip the spreadsheet grid") {
    assert(Seq(1, 26, 27, 52, 703).map(Sheets.columnLetters)
      == Seq("A", "Z", "AA", "AZ", "AAA"))
    for (n <- 1 to 1000) assert(Sheets.letterIndex(Sheets.columnLetters(n)) == n)
    intercept[IllegalArgumentException](Sheets.columnLetters(0))
    intercept[IllegalArgumentException](Sheets.letterIndex("a1"))
  }

  test("getData: whole-tab range, header row becomes the schema") {
    val fake = new Fake(Seq(Right(Some(Seq(
      Seq("symbol", "price", "ts"),
      Seq("BTC", "60000.5", "2024-01-01"),
      Seq("ETH", "3000.25", "2024-01-01"))))))
    val (ok, df) = sheets(fake).getData(0L)
    assert(ok)
    assert(fake.getRanges.toSeq == Seq("prices!A1:C"))
    assert(df.columns.toSeq == Seq("symbol", "price", "ts"))
    assert(df.count() == 2)
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    // dimension regime: the frame carries a broadcast hint
    assert(df.queryExecution.analyzed.toString.contains("ResolvedHint"))
  }

  test("getData retries 429/503/500 then succeeds; sleeps between tries") {
    sleeps.clear()
    val fake = new Fake(Seq(Left(429), Left(503), Left(500),
      Right(Some(Seq(Seq("h"), Seq("v"))))))
    val (ok, df) = sheets(fake).getData(0L)
    assert(ok && df.count() == 1)
    assert(fake.getRanges.length == 4)
    assert(sleeps.count(_ == 5000L) == 3)  // retry throttle
    assert(sleeps.count(_ == 2000L) == 1)  // post-read throttle
  }

  test("getData gives up after five retryable failures → (false, empty)") {
    val fake = new Fake(Seq.fill(5)(Left(429)))
    val (ok, df) = sheets(fake).getData(0L)
    assert(!ok && df.isEmpty)
    assert(fake.getRanges.length == 5)
  }

  test("getData propagates non-retryable HTTP errors") {
    val fake = new Fake(Seq(Left(403)))
    intercept[SheetsHttpError](sheets(fake).getData(0L))
  }

  test("getDataFixedRows: ranged read, exact-width rows only") {
    val fake = new Fake(Seq(Right(Some(Seq(
      Seq("BTC", "1"),          // too narrow → dropped
      Seq("ETH", "2", "x"),     // exact
      Seq("SOL", "3", "y", "z") // too wide → dropped
    )))))
    val df = sheets(fake).getDataFixedRows(0L, Seq("sym", "px", "note"),
      "A", "C", readRowsFrom = 2)
    assert(fake.getRanges.toSeq == Seq("prices!A2:C"))
    assert(df.columns.toSeq == Seq("sym", "px", "note"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("ETH"))
  }

  test("getDataFixedRows: sheet shorter than readRowsFrom → no fetch, empty schema") {
    val fake = new Fake()
    val df = sheets(fake).getDataFixedRows(77L, Seq("a", "b"), "A", "B",
      readRowsFrom = 9)  // wide has rowCount=5
    assert(fake.getRanges.isEmpty)
    assert(df.columns.toSeq == Seq("a", "b") && df.isEmpty)
  }

  test("getDataFixedRows retries only 429; multi-letter span parses") {
    val fake = new Fake(Seq(Left(429), Right(Some(Seq(Seq("1", "2"))))))
    val df = sheets(fake).getDataFixedRows(77L, Seq("a", "b"), "AA", "AB", 1)
    assert(fake.getRanges.toSeq == Seq("wide!AA1:AB", "wide!AA1:AB"))
    assert(df.count() == 1)
    val fail = new Fake(Seq(Left(503)))
    intercept[SheetsHttpError](
      sheets(fail).getDataFixedRows(0L, Seq("a"), "A", "A", 1))
  }

  test("appendDataFrame: RAW stringified cells, nulls as empty") {
    import spark.implicits._
    val fake = new Fake()
    val df = Seq(("BTC", Some(1.5)), ("ETH", None)).toDF("sym", "px")
    sheets(fake).appendDataFrame(df, 0L)
    val (range, values) = fake.appends.head
    assert(range == "prices!A1:C")
    assert(values.map(_.head).sorted == Seq("BTC", "ETH"))
    assert(values.find(_.head == "ETH").get(1) == "")
    sheets(fake).appendDataFrame(df.limit(0), 0L, columnTill = Some("B"))
    assert(fake.appends(1)._1 == "prices!A1:B")
  }

  test("appendDataFrame refuses frames over the maxRows cap") {
    import spark.implicits._
    val fake = new Fake()
    val df = (1 to 20).map(i => (s"s$i", i.toDouble)).toDF("sym", "px")
    val e = intercept[IllegalArgumentException](
      sheets(fake).appendDataFrame(df, 0L, maxRows = 10))
    assert(e.getMessage.contains("maxRows=10"))
    assert(fake.appends.isEmpty)  // failed BEFORE any partial append
    sheets(fake).appendDataFrame(df, 0L, maxRows = 20)
    assert(fake.appends.head._2.length == 20)
  }

  test("clearSheet starts at A2 — the header row survives") {
    val fake = new Fake()
    val s = sheets(fake)
    s.clearSheet(0L)
    s.clearSheet(77L, columnTill = Some("AB"))
    assert(fake.clears.toSeq == Seq("prices!A2:C", "wide!A2:AB"))
  }

  test("unknown gid fails fast") {
    intercept[RuntimeException](sheets(new Fake()).getData(999L))
  }
}

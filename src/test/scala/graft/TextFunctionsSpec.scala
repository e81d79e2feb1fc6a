package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount and distinct tokens") {
    val df = Seq("the quick  brown the fox").toDF("text")
    val r = df.select(tokenCount(col("text")).as("n"),
      size(array_distinct(tokens(lower(col("text"))))).as("d")).head()
    assert(r.getInt(0) == 5)
    assert(r.getInt(1) == 4)
  }

  test("stopwordRatio and meanTokenLength") {
    val df = Seq("the cat and the dog").toDF("text")
    val r = df.select(
      stopwordRatio(col("text"), Seq("the", "and")).as("sr"),
      meanTokenLength(col("text")).as("mt")).head()
    assert(r.getDouble(0) == 0.6)          // 3 of 5
    assert(r.getDouble(1) == 15.0 / 5)     // 3+3+3+3+3
  }

  test("charClassRatio counts punctuation density") {
    val df = Seq("a,b,c!").toDF("text")
    val r = df.select(charClassRatio(col("text"), "[\\p{Punct}]")).head()
    assert(r.getDouble(0) == 0.5)
  }

  test("langId picks the language with the most marker hits") {
    val df = Seq(
      "der hund und die katze das haus",
      "the cat sat on a mat of wool",
      "le chat et la souris dans les arbres").toDF("text")
    val out = df.select(langId(col("text"), Seq(
      "en" -> Seq("the", "a", "of"),
      "de" -> Seq("der", "die", "das"),
      "fr" -> Seq("le", "la", "les"))).as("l")).as[String].collect()
    assert(out.toSeq == Seq("de", "en", "fr"))
  }

  test("fingerprint is whitespace/case-normalized") {
    val df = Seq(("A  Quick   Fox", "a quick fox")).toDF("a", "b")
    val r = df.select(
      (fingerprint(col("a")) === fingerprint(col("b"))).as("same"),
      (md5Fingerprint(col("a")) === md5Fingerprint(col("b"))).as("same2")).head()
    assert(r.getBoolean(0) && r.getBoolean(1))
  }

  test("shingles: word and char n-grams") {
    val df = Seq("a b c d").toDF("text")
    val r = df.select(wordShingles(col("text"), 2).as("w"),
      charShingles(col("text"), 3).as("c")).head()
    assert(r.getSeq[String](0) == Seq("a b", "b c", "c d"))
    assert(r.getSeq[String](1).head == "a b")
    assert(r.getSeq[String](1).forall(_.length == 3))
  }

  test("qualityScore stays in [0,1] and ranks fluent text above noise") {
    val df = Seq(
      "the cat and the dog walked to the house of a friend and the day was long",
      "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( )))) @@@@ #### $$$$").toDF("text")
    val s = df.select(qualityScore(col("text"), Seq("the", "a", "and", "of", "to"))
      .as("q")).as[Double].collect()
    assert(s.forall(v => v >= 0.0 && v <= 1.0))
    assert(s(0) > s(1))
  }
}

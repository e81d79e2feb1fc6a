package graft

import graft.io.Layout
import graft.sources.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

class LayoutSpec extends SparkSpec {

  private def fileRanges(dir: String, c: String): Seq[(String, String)] = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(c)).cast("string"), max(col(c)).cast("string")).head()
      (r.getString(0), r.getString(1))
    }
  }

  test("clustered write produces disjoint per-file ranges (row groups prune)") {
    val dir = Files.createTempDirectory("layout").toString
    val li = Tables.lineitem(spark, sfDir)

    Layout.clusteredWrite(li, s"$dir/clustered", Seq("l_shipdate"), numFiles = 4)
    val clustered = fileRanges(s"$dir/clustered", "l_shipdate").sortBy(_._1)
    assert(clustered.size == 4)
    // each file's min is at or after the previous file's max: a filter on
    // l_shipdate hits at most one file's row groups (+1 at a boundary)
    clustered.sliding(2).foreach { case Seq((_, hiA), (loB, _)) =>
      assert(loB >= hiA, s"overlapping file ranges: $clustered")
    }

    // control: a hash/round-robin layout spans ~the full range in EVERY
    // file — nothing can prune
    li.repartition(4).write.parquet(s"$dir/scattered")
    val scattered = fileRanges(s"$dir/scattered", "l_shipdate")
    def ms(s: String) = java.sql.Timestamp.valueOf(s).getTime
    val globalSpan = ms(scattered.map(_._2).max) - ms(scattered.map(_._1).min)
    assert(scattered.forall { case (lo, hi) =>
      ms(hi) - ms(lo) > 0.9 * globalSpan
    }, s"expected every scattered file to span ~the full range: $scattered")

    // same rows either way
    assert(spark.read.parquet(s"$dir/clustered").count() == li.count())
  }

  test("clustered read answers a range filter identically") {
    val dir = Files.createTempDirectory("layout2").toString
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_shipdate")
    Layout.clusteredWrite(li, s"$dir/c", Seq("l_shipdate"), numFiles = 3)
    val expect = li.filter(col("l_shipdate") >= "1995-01-01").count()
    val got = spark.read.parquet(s"$dir/c")
      .filter(col("l_shipdate") >= "1995-01-01").count()
    assert(got == expect)
  }
}

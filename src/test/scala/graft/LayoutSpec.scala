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

  test("zorder2 matches a bit-by-bit interleave reference") {
    import spark.implicits._
    def slowZ(x: Long, y: Long): Long =
      (0 until 16).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val rnd = new scala.util.Random(7)
    val pts = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L),
      (3L, 0L), (0L, 3L)) ++ Seq.fill(200)((rnd.nextLong(65536L), rnd.nextLong(65536L)))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zorder2(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == slowZ(x, y), s"($x,$y)") }
    assert(got.collectFirst { case (65535L, 0L, z) => z }.get == 0x55555555L)
  }

  test("zordered write keeps BOTH dimensions tight per file; range layout only one") {
    import spark.implicits._
    val dir = Files.createTempDirectory("layout3").toString
    // deterministic pseudo-uniform points on a 256×256 grid — both
    // dimensions need comparable cardinality for 2-D locality to exist
    // (lineitem at tiny SF has a 10-value suppkey domain: nothing to tile)
    val pts = Seq.tabulate(8192) { i =>
      ((i * 2654435761L) % 256L, (i * 40503L + 17L) % 256L)
    }.toDF("x", "y")
    Layout.zorderedWrite(pts, s"$dir/z", "x", "y", numFiles = 64)
    Layout.clusteredWrite(pts, s"$dir/r", Seq("x"), numFiles = 64)
    def spans(path: String, c: String): Seq[Long] =
      fileRanges(path, c).map { case (lo, hi) => hi.toLong - lo.toLong }
    // single-dim range clustering: y spans over half the domain in
    // every file (nothing prunes a y filter)
    assert(spans(s"$dir/r", "y").forall(_ > 0.5 * 255))
    // z-order: the MEDIAN file keeps both dimensions well under the
    // domain span (Morton runs are tiles, so a filter on either column
    // skips most files). Medians, not max — the odd file straddling a
    // high-bit Morton boundary legitimately spans wide.
    def median(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)
    assert(median(spans(s"$dir/z", "x")) < 0.25 * 255,
      s"x spans: ${spans(s"$dir/z", "x")}")
    assert(median(spans(s"$dir/z", "y")) < 0.25 * 255,
      s"y spans: ${spans(s"$dir/z", "y")}")
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

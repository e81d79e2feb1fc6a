package graft

import graft.io.Maintenance
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("partition-scoped dedup rewrites only the named partitions (D2)") {
    val dir = Files.createTempDirectory("dedup").toString + "/t"
    val df = Seq(
      ("202401", 1L, "a"), ("202401", 1L, "a"),   // dup in 202401
      ("202401", 2L, "b"),
      ("202402", 3L, "c"), ("202402", 3L, "c"))   // dup in 202402 (untouched)
      .toDF("ym", "id", "v")
    df.write.partitionBy("ym").parquet(dir)
    val n = Maintenance.dedupPartitions(spark, dir, "ym", Seq("id"), Seq("202401"))
    assert(n == 2)  // 202401 deduped to 2 rows
    val after = spark.read.parquet(dir)
    assert(after.filter(col("ym") === "202401").count() == 2)
    assert(after.filter(col("ym") === "202402").count() == 2) // untouched dup remains
  }

  test("flushPartitions deletes named partitions; absent table is a no-op (D4)") {
    val dir = Files.createTempDirectory("flush").toString + "/t"
    assert(!Maintenance.flushPartitions(spark, dir, "ym", Seq("202401")))
    Seq(("202401", 1L), ("202402", 2L)).toDF("ym", "id")
      .write.partitionBy("ym").parquet(dir)
    assert(Maintenance.flushPartitions(spark, dir, "ym", Seq("202401")))
    val after = spark.read.parquet(dir)
    assert(after.select("ym").distinct().as[String].collect().toSeq == Seq("202402"))
  }

  test("yyyymm enumerates monthly partitions like the reference") {
    val ps = Maintenance.yyyymm(2023, 2024)
    assert(ps.size == 24 && ps.head == "202301" && ps.last == "202412")
  }
}

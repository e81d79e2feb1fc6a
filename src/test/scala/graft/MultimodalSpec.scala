package graft

import graft.multimodal.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.fromDocuments(Tables.documents(spark, sfDir))
  private val codec = () => new Multimodal.StubCodec: Multimodal.MediaCodec

  test("media frame carries payload + typed metadata") {
    val m = media
    assert(m.schema("payload").dataType.typeName == "binary")
    val r = m.orderBy("media_id").head()
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[String]("kind") == "image")
    assert(meta.getAs[Long]("n_bytes") > 0)
    assert(r.getAs[Array[Byte]]("payload").length == meta.getAs[Long]("n_bytes"))
  }

  test("extractFeatures: per-partition decode, normalized histogram features") {
    val f = Multimodal.extractFeatures(media, codec)
    val row = f.orderBy("media_id").head()
    val feats = row.getSeq[Float](row.fieldIndex("features"))
    assert(feats.length == 16)
    assert(math.abs(feats.sum - 1.0f) < 1e-3)  // normalized histogram
    assert(f.count() == media.count())
  }

  test("resizeAll bounds payload size") {
    val r = Multimodal.resizeAll(media, 8, 8, codec)
    val sizes = r.select(length(col("payload")).as("n")).as[Int].collect()
    assert(sizes.forall(_ <= 64))
  }

  test("sampleFrames: stride slicing capped at 8 frames") {
    val fr = Multimodal.sampleFrames(media, everyMs = 64, codec)
    val counts = fr.groupBy("media_id").count().as[(Long, Long)].collect().toMap
    val bytes = media.select(col("media_id"), col("meta.n_bytes")).as[(Long, Long)]
      .collect().toMap
    counts.foreach { case (id, n) =>
      assert(n == math.min(math.ceil(bytes(id) / 64.0).toLong, 8L))
    }
  }

  test("repartitionForDecode sizes partitions by bytes") {
    val m = Multimodal.repartitionForDecode(media, targetBytesPerPartition = 10000)
    val total = media.agg(sum("meta.n_bytes")).head().getLong(0)
    assert(m.rdd.getNumPartitions == math.ceil(total / 10000.0).toInt)
  }
}

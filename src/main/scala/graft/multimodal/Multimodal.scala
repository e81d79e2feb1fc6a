package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines.
  *
  * Design: media is an opaque `binary` column plus a typed metadata
  * struct; decode / feature-extract / resize / frame-sample run as
  * `mapPartitions` over the binary payloads (the Scala analog of
  * `mapInPandas` — per-partition batch processing, one codec instance per
  * partition, no per-row setup cost). The Spark-side plumbing — schema,
  * partition sizing, batch shape — is real; the codec itself is
  * injectable because image/audio libraries are not available in this
  * environment. [[StubCodec]] is the deterministic stand-in: real
  * deployments swap in a JNI/ffmpeg/ImageIO-backed [[MediaCodec]] without
  * touching the plan.
  *
  * Scale notes: payloads never pass through a shuffle — decode runs in
  * the scan stage; feature vectors (small) are what downstream operators
  * see. `repartitionForDecode` sizes partitions by payload bytes, not row
  * count, so one 4K video and a thousand thumbnails get comparable task
  * times.
  */
object Multimodal {

  /** media row schema: id + payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType, nullable = false),      // image|audio|video
      StructField("format", StringType, nullable = false),    // png|wav|mp4|...
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("n_bytes", LongType, nullable = false))), nullable = false)))

  /** What a codec must provide. Implementations must be serializable and
    * cheap to construct per partition. */
  trait MediaCodec extends Serializable {
    def decodeImage(payload: Array[Byte]): Array[Float]          // pixel features
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte]
    def sampleFrames(payload: Array[Byte], everyMs: Long): Seq[Array[Byte]]
  }

  /** Deterministic fake codec: "features" are a byte histogram, "resize"
    * re-hashes to the requested size, "frames" are fixed-stride slices.
    * Real decode is environment-dependent; the contract and batch shape
    * are what this module tests. */
  class StubCodec extends MediaCodec {
    def decodeImage(payload: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](16)
      var i = 0
      while (i < payload.length) { hist(payload(i) & 0x0F) += 1f; i += 1 }
      if (payload.length > 0) { var j = 0; while (j < 16) { hist(j) /= payload.length; j += 1 } }
      hist
    }
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](math.max(1, math.min(w * h, payload.length)))
      System.arraycopy(payload, 0, out, 0, out.length)
      out
    }
    def sampleFrames(payload: Array[Byte], everyMs: Long): Seq[Array[Byte]] = {
      val stride = math.max(1, everyMs.toInt)
      payload.grouped(stride).take(8).toSeq
    }
  }

  /** Real file ingestion: a directory tree read through Spark's
    * `binaryFile` source into the media schema (+ a trailing `path`
    * column for provenance). Media kind/format derive from the file
    * extension; `media_id` is a 64-bit hash of the path (stable across
    * runs and clusters). `pathGlobFilter` pushes the glob into file
    * listing — never reads non-matching payloads — and payloads stay in
    * the scan stage exactly like the synthesized path. */
  def fromBinaryFiles(spark: SparkSession, dir: String,
      glob: Option[String] = None, recursive: Boolean = true): DataFrame = {
    val reader = glob.foldLeft(spark.read.format("binaryFile"))(
      (r, g) => r.option("pathGlobFilter", g))
      .option("recursiveFileLookup", recursive.toString)
    val ext = lower(element_at(split(col("path"), "\\."), -1))
    val kind = when(ext.isin("png", "jpg", "jpeg", "gif", "bmp", "webp"), "image")
      .when(ext.isin("wav", "mp3", "flac", "ogg"), "audio")
      .when(ext.isin("mp4", "avi", "mkv", "webm", "mov"), "video")
      .otherwise("binary")
    reader.load(dir).select(
      xxhash64(col("path")).as("media_id"),
      col("content").as("payload"),
      struct(
        kind.as("kind"),
        ext.as("format"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"),
        col("length").as("n_bytes")).as("meta"),
      col("path"))
  }

  /** Wrap a source table into the media schema (payload synthesized from
    * a string column here; [[fromBinaryFiles]] is the real-file path). */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("image").as("kind"),
        lit("raw").as("format"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"),
        length(col("text")).cast("long").as("n_bytes")).as("meta"))

  /** Partition by cumulative payload bytes — the decode stage's unit of
    * work — instead of row count. Byte-balanced bin packing: a global
    * running sum of payload bytes (distributed prefix sum, never the
    * single-partition window) assigns each row the bin of its last
    * byte, so every decode task sees ~`targetBytesPerPartition` even
    * when one partition's files are 1000× another's. A file bigger than
    * the target gets a bin to itself (a payload can't split). Plain
    * `repartition(n)` round-robins by ROW and leaves byte-skew intact —
    * exactly what kills decode stages on mixed thumbnail/4K corpora. */
  def repartitionForDecode(media: DataFrame, targetBytesPerPartition: Long): DataFrame = {
    val totalRow = media.agg(sum(col("meta.n_bytes"))).head()
    if (totalRow.isNullAt(0)) return media  // empty input
    val parts = math.max(1,
      math.ceil(totalRow.getLong(0).toDouble / targetBytesPerPartition).toInt)
    val cum = graft.operators.PrefixSum.globalRunningSum(
      media.withColumn("__nb", coalesce(col("meta.n_bytes"), lit(0L))),
      "media_id", "__nb", "__cum")
    val binned = cum.withColumn("__bin",
      expr(s"(__cum - 1) div ${targetBytesPerPartition}L"))
    // Exact bin → partition identity: range partitioning SAMPLES its
    // boundaries and can merge two bins into one task; a hash would
    // collide them. This is the same deliberate RDD hop as the prefix
    // sum's carry pass — the payload shuffle happens either way.
    val schema = binned.schema
    val binIdx = schema.fieldIndex("__bin")
    val placed = binned.rdd.map(r => (r.getLong(binIdx), r))
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = parts
        override def getPartition(key: Any): Int =
          math.min(key.asInstanceOf[Long], (parts - 1).toLong).toInt
      }).values
    media.sparkSession.createDataFrame(placed, schema)
      .drop("__nb", "__cum", "__bin")
  }

  /** Decode → feature-extract as a per-partition batch map. Output:
    * (media_id, features array<float>, n_bytes). */
  def extractFeatures(media: DataFrame, codec: () => MediaCodec): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = true),
      StructField("n_bytes", LongType, nullable = false)))
    val enc = Encoders.row(outSchema)
    val src = media.select("media_id", "payload")
    src.mapPartitions { rows =>
      val c = codec() // one codec instance per partition (mapInPandas batch analog)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val feats = if (payload == null) null else c.decodeImage(payload)
        Row(r.getAs[Long]("media_id"), feats,
          if (payload == null) 0L else payload.length.toLong)
      }
    }(enc)
  }

  /** Resize every payload (image path). */
  def resizeAll(media: DataFrame, w: Int, h: Int, codec: () => MediaCodec): DataFrame = {
    val enc = Encoders.row(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true))))
    media.select("media_id", "payload").mapPartitions { rows =>
      val c = codec()
      rows.map { r =>
        val p = r.getAs[Array[Byte]]("payload")
        Row(r.getAs[Long]("media_id"), if (p == null) null else c.resize(p, w, h))
      }
    }(enc)
  }

  /** Frame sampling (video path): one output row per sampled frame. */
  def sampleFrames(media: DataFrame, everyMs: Long, codec: () => MediaCodec): DataFrame = {
    val enc = Encoders.row(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = true))))
    media.select("media_id", "payload").mapPartitions { rows =>
      val c = codec()
      rows.flatMap { r =>
        val p = r.getAs[Array[Byte]]("payload")
        if (p == null) Iterator.empty
        else c.sampleFrames(p, everyMs).iterator.zipWithIndex.map {
          case (f, i) => Row(r.getAs[Long]("media_id"), i, f)
        }
      }
    }(enc)
  }
}

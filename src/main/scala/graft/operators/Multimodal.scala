package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2C q41): media payloads as
  * opaque binary columns + typed metadata, with decode/feature-extract
  * as a partition-mapped stage.
  *
  * The Spark-side plumbing is real — schema, typed Dataset encoders,
  * partitioning, per-partition batch processing — while the actual
  * byte decoding is STUBBED (image/audio codecs are not in this
  * container): `decodeStub` derives deterministic fake features from
  * the bytes. Swapping in a real decoder touches only that function.
  *
  * At 100 TB: binary payloads dominate I/O, so the media frame is
  * repartitioned before the decode stage to even out payload skew, and
  * features are computed per-partition (amortizing any
  * decoder-initialization cost exactly like a Pandas-UDF batch would).
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, mime: String, content: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Long, content_hash: Long,
      fake_width: Int, fake_height: Int)

  /** STUB decode: deterministic fake features in place of a real codec.
    * The stand-in is the cross-engine 60-bit md5 of the payload
    * ([[graft.functions.HashExpressions.Md5Kernels]]), so even though
    * the features are fake, the partition-mapped decode PATH is
    * oracle-checkable end-to-end — DuckDB reproduces every value. */
  def decodeStub(row: MediaRow): MediaFeatures = {
    val md = graft.functions.HashExpressions.Md5Kernels.digest()
    val h = graft.functions.HashExpressions.Md5Kernels.first60(md.digest(row.content))
    MediaFeatures(
      doc_id = row.doc_id,
      mime = row.mime,
      n_bytes = row.content.length.toLong,
      content_hash = h,
      fake_width = (h % 640).toInt,
      fake_height = ((h / 640) % 480).toInt)
  }

  /** Build a media frame from the documents table: payload as binary,
    * mime derived from source — the schema a real ingest would carry. */
  def mediaFrame(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      when(col("source").isin("src0", "src1"), "image/png")
        .when(col("source").isin("src2", "src3"), "audio/wav")
        .otherwise("video/mp4").as("mime"),
      col("text").cast(BinaryType).as("content"))

  final case class FrameSample(doc_id: Long, frame_idx: Int, frame_hash: Long)

  /** STUB resize: a real implementation decodes, scales, re-encodes;
    * the stub derives a deterministic "resized" payload slice so the
    * batch shape (binary in → binary out, metadata updated) is real. */
  def resizeStub(row: MediaRow, maxBytes: Int = 64): MediaRow =
    row.copy(content = row.content.take(maxBytes))

  /** STUB frame sampling: every `stride`-th chunk of the payload stands
    * in for a decoded video frame; emits one row per sampled frame —
    * the 1→N explode shape a real frame sampler has. */
  def frameSampleStub(row: MediaRow, chunk: Int = 32, stride: Int = 4): Iterator[FrameSample] =
    row.content.grouped(chunk).zipWithIndex
      .filter(_._2 % stride == 0)
      .map { case (bytes, i) =>
        FrameSample(row.doc_id, i,
          scala.util.hashing.MurmurHash3.bytesHash(bytes, 42).toLong)
      }

  /** resize stage: per-partition map keeping the binary column shape. */
  def resizeAll(documents: DataFrame, maxBytes: Int = 64): Dataset[MediaRow] = {
    val spark = documents.sparkSession
    import spark.implicits._
    mediaFrame(documents).as[MediaRow].mapPartitions(_.map(resizeStub(_, maxBytes)))
  }

  /** frame-sample stage: 1→N flatMap per media row. */
  def sampleFrames(documents: DataFrame): Dataset[FrameSample] = {
    val spark = documents.sparkSession
    import spark.implicits._
    mediaFrame(documents).as[MediaRow].mapPartitions(_.flatMap(frameSampleStub(_)))
  }

  /** q41b: media manifest over the metadata layer only — mime, payload
    * byte counts, id range per media type. No decode involved, so
    * unlike q41's stubbed features this IS oracle-checkable: it proves
    * the binary-column schema and byte accounting (the real part of
    * the multimodal plumbing) against DuckDB exactly. */
  def mediaManifest(documents: DataFrame): DataFrame =
    mediaFrame(documents)
      .select(col("doc_id"), col("mime"), length(col("content")).cast(LongType).as("n_bytes"))
      .groupBy("mime")
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("mime")

  /** q41: decode/feature-extract stage — typed per-partition map over
    * the media frame, then a per-mime summary so the output is compact
    * and deterministic. Oracle-checked: the md5-based stub features let
    * DuckDB verify the typed mapPartitions path produced exactly the
    * right values per payload. */
  def extractFeatures(documents: DataFrame, partitions: Int = 32): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val media: Dataset[MediaRow] = mediaFrame(documents)
      .repartition(partitions, col("doc_id"))
      .as[MediaRow]
    val features = media.mapPartitions(_.map(decodeStub)).toDF()
    features
      .groupBy("mime")
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("content_hash")).as("min_hash"),
        max(col("fake_width")).cast(LongType).as("max_width"))
      .orderBy("mime")
  }
}

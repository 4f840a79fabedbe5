package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.operators.Similarity

/** Structured Streaming over the embedding store: the maintenance half
  * of the compressed vector index. Codebooks are trained batch-side on
  * a released corpus ([[Similarity.pqCodebooks]] — frozen, versioned);
  * every arriving vector is then PQ-encoded row-locally against the
  * broadcast model and appended to the (cell, codes) index the q78
  * search probes. Stateless — no watermark, no state store; the
  * streaming plan is the batch encode expressions verbatim, which is
  * what makes the continuously-maintained index provably identical to
  * a batch rebuild (spec: StreamingSpec). */
object VecStreams {

  val vecsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** File-source stream over a directory of embeddings parquet. */
  def readVecStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(vecsSchema).parquet(dir)

  /** ingest-time PQ encode against the frozen codebooks. */
  def pqEncodeStream(vecs: DataFrame, books: Seq[Seq[Seq[Double]]],
                     m: Int = 8, dim: Int = 64): DataFrame =
    Similarity.pqEncodeWithModel(vecs, books, m, dim)

  /** ingest-time RESIDUAL encode (q81's stream twin): cell assignment +
    * residual subtraction + code assignment against the frozen IVF
    * centroids and residual codebooks — appends directly to the
    * partitioned residual index the q81b search probes. */
  def rpqEncodeStream(vecs: DataFrame, cents: Seq[Seq[Double]],
                      books: Seq[Seq[Seq[Double]]],
                      m: Int = 8, dim: Int = 64): DataFrame =
    Similarity.pqResidualEncodeWithModel(vecs, cents, books, m, dim)
}

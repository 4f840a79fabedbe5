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

  /** ingest-time CLUSTER ASSIGNMENT (q104's stream twin): every
    * arriving vector is labeled with its cell and basis-point centroid
    * cosine against the frozen k-means — the door where
    * cluster-balanced routing and pruning decisions happen at ingest
    * (a vector landing in an over-budget cell can be deferred or
    * downsampled before it ever reaches the corpus). Stateless; the
    * streaming plan is the batch assignment expressions verbatim
    * ([[Similarity.clusterAssignWithModel]] — one shared function, so
    * batch and stream cannot drift). */
  def clusterAssignStream(vecs: DataFrame, cents: Seq[Seq[Double]]): DataFrame =
    Similarity.clusterAssignWithModel(vecs, cents)

  /** the q129 verdicts at the vector-ingest door: every arriving
    * vector carries its health flags (null / zero-norm / non-finite /
    * dim), so a deployment quarantines poison vectors BEFORE they
    * reach the store, the index writer, or any dot product — the
    * gate the q129 batch card audits after the fact. The SAME
    * row-local kernel as the batch rollup ([[Similarity
    * .withHealthCols]] — one definition, no drift); stateless ⇒
    * micro-batch invariant. */
  def vectorHealthLookup(vecs: DataFrame): DataFrame =
    Similarity.withHealthCols(vecs)
      .withColumn("vec_ok",
        !org.apache.spark.sql.functions.col("is_null")
          && !org.apache.spark.sql.functions.col("is_zero")
          && !org.apache.spark.sql.functions.col("has_nonfinite"))

  /** ingest-time VECTOR REPORT (the vecReport frame's stream twin):
    * one pass per arriving vector computes cell + centroid cosine +
    * packed PQ code + reconstruction error against the frozen model
    * pair — the SAME function as the batch frame, so the continuously
    * maintained report is provably identical to a batch rebuild. */
  def vecReportStream(vecs: DataFrame, cents: Seq[Seq[Double]],
                      books: Seq[Seq[Seq[Double]]],
                      m: Int = 8, dim: Int = 64): DataFrame =
    Similarity.vecReportWithModels(vecs, cents, books, m, dim)

  /** CONTINUOUS index maintenance — q82's stream form, closing the
    * loop: every arriving micro-batch is residual-encoded against the
    * frozen model pair ([[rpqEncodeStream]]'s expressions) and MERGEd
    * by vec_id into the persisted cell-partitioned index through the
    * partition-scoped writer, so each batch rewrites ONLY the cells it
    * lands in and every other cell's files stay physically untouched —
    * the index the q81b search probes is continuously current without
    * a rebuild. The checkpoint makes delivery effectively-once per
    * batch; the keyed merge is idempotent under batch replay (the q43
    * discipline), which is the recovery story. Same insert-only
    * contract as the batch q82: a re-embedded key that changes coarse
    * cell needs a delete+insert pair across two merges. */
  def indexMaintainSink(vecs: DataFrame, path: String, checkpoint: String,
                        cents: Seq[Seq[Double]], books: Seq[Seq[Seq[Double]]],
                        m: Int = 8, dim: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.MergeWriter.applyToPartitioned(batch.sparkSession, path,
          Similarity.pqResidualEncodeWithModel(batch.toDF(), cents, books, m, dim),
          "vec_id", "cell")
      }
      .start()
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Corpus, Dedup, TextAnalysis}

/** Structured Streaming form of the corpus-construction path: the
  * row-local screens of the q55 pipeline (language-ID, quality score,
  * reproducible sampling) run unchanged on a live document ingest
  * stream — they are stateless projections, so the batch and streaming
  * plans are literally the same expressions. Content dedup becomes
  * `dropDuplicatesWithinWatermark` on the fingerprint with an
  * ingest-time watermark: state holds one watermark's worth of
  * fingerprints (bounded), and the first arrival of each content wins —
  * the streaming analogue of the batch min-doc_id canonical pick.
  *
  * The token-budget cut intentionally stays batch-side: a global
  * per-language running sum has no bounded-state streaming form; the
  * production shape is screen-on-ingest (this), pack-on-snapshot (q49).
  */
object DocStreams {

  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source stream over a directory of documents parquet. */
  def readDocStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docsSchema).parquet(dir)

  /** Incremental corpus screen: every stage's verdict as a column
    * (same trail as the batch pipeline), survivors only. */
  def corpusScreen(docs: DataFrame, rateBpByLang: Seq[(String, Int)],
                   defaultBp: Int): DataFrame = {
    val thr = rateBpByLang.foldLeft(lit(Corpus.rateThreshold(defaultBp))) {
      case (acc, (lang, bp)) => when(col("lang") === lang, lit(Corpus.rateThreshold(bp))).otherwise(acc)
    }
    docs
      .withColumn("n_chars", length(col("text")).cast(LongType))
      .withColumn("n_alpha",
        length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast(LongType))
      .withColumn("alpha_bp", expr("(10000 * n_alpha) DIV nullif(n_chars, 0)"))
      .withColumn("is_quality",
        col("n_chars").between(50, 20000) && col("alpha_bp") > 6000)
      .withColumn("fingerprint", TextAnalysis.fingerprintCol(col("text")))
      .withColumn("sampled",
        Dedup.md5_60(concat(lit("sample:"), col("doc_id").cast("string"))) < thr)
      .withColumn("ingest_ts", current_timestamp())
      .withWatermark("ingest_ts", "1 hour")
      .dropDuplicatesWithinWatermark("fingerprint")
      .filter(col("is_quality") && col("sampled"))
      .select("doc_id", "lang", "fingerprint", "alpha_bp")
  }
}

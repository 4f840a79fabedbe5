package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Corpus-construction operators for training-data pipelines
  * (SURVEY.md §2C): reproducible sampling and token-budget packing —
  * the steps between "scored/deduped documents" and "the corpus we
  * actually train on".
  */
object Corpus {

  /** floor(2^60 · bp / 10000) — the keep-threshold for a rate in basis
    * points against the 60-bit md5 hash. Computed exactly in BigInt and
    * inlined as the SAME literal into the DuckDB oracle SQL. */
  def rateThreshold(bp: Int): Long = ((BigInt(1) << 60) * bp / 10000).toLong

  /** per-language keep-threshold column — the ONE definition q48, q55
    * and the streaming screen share (langs not listed get `defaultBp`).
    */
  def thresholdCol(rateBpByLang: Seq[(String, Int)], defaultBp: Int): org.apache.spark.sql.Column =
    rateBpByLang.foldLeft(lit(rateThreshold(defaultBp))) {
      case (acc, (lang, bp)) => when(col("lang") === lang, lit(rateThreshold(bp))).otherwise(acc)
    }

  /** the sampling hash: a pure function of doc_id, salted so it's
    * independent of every other md5-keyed decision in the engine. */
  def sampleHash: org.apache.spark.sql.Column =
    Dedup.md5_60(concat(lit("sample:"), col("doc_id").cast("string")))

  /** the ONE BPE-ish token count (q39's segmentation) — shared by the
    * pipeline, the packer and the corpus card so a tokenizer change
    * cannot make the card report different counts than the cut used. */
  def tokenCountCol: org.apache.spark.sql.Column =
    expr("size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0))")
      .cast(LongType)

  /** the ONE dedup-survivor rule (min doc_id per content fingerprint;
    * requires the `fingerprint` column from [[withScreenColumns]]). */
  def keepDedupCol: org.apache.spark.sql.Column =
    col("doc_id") === min(col("doc_id")).over(Window.partitionBy("fingerprint"))

  /** row-local screen verdicts appended in one block — quality columns
    * (q38 definitions), content fingerprint and the sampling decision.
    * Shared verbatim by the batch pipeline (q55) and the streaming
    * screen (graft.streaming.DocStreams), so the two cannot drift. */
  def withScreenColumns(docs: DataFrame, rateBpByLang: Seq[(String, Int)],
                        defaultBp: Int): DataFrame =
    docs
      .withColumn("n_chars", length(col("text")).cast(LongType))
      .withColumn("n_alpha",
        length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast(LongType))
      .withColumn("alpha_bp", expr("(10000 * n_alpha) DIV nullif(n_chars, 0)"))
      .withColumn("is_quality",
        col("n_chars").between(50, 20000) && col("alpha_bp") > 6000)
      .withColumn("fingerprint", TextAnalysis.fingerprintCol(col("text")))
      .withColumn("sampled", sampleHash < thresholdCol(rateBpByLang, defaultBp))

  /** q48: deterministic stratified sampling — keep a document iff
    * md5_60('sample:' ‖ doc_id) falls below its language's rate
    * threshold. The decision is a pure row-local function of doc_id:
    * no shuffle (bar the output sort), reproducible across runs,
    * backfills and engines, and stable under repartitioning — which is
    * why hash-threshold sampling, not rand(), is the 100 TB idiom.
    * Rates are (lang → basis points); langs not listed get `defaultBp`.
    */
  def stratifiedSample(docs: DataFrame, rateBpByLang: Seq[(String, Int)],
                       defaultBp: Int): DataFrame =
    docs.select(col("doc_id"), col("lang"), sampleHash.as("sample_hash"))
      .filter(col("sample_hash") < thresholdCol(rateBpByLang, defaultBp))
      .orderBy("doc_id")

  /** q55: the END-TO-END corpus-construction pipeline — what the
    * reference does as a chain of scripts
    * (query → validate → annotate → curate → push), composed here as
    * ONE declarative flow: language-ID → quality score → fingerprint
    * dedup → reproducible sampling → per-language token-budget cut,
    * with a per-document decision trail (each stage's verdict as a
    * column, final `keep` is their conjunction).
    *
    * Plan shape: every stage except dedup and packing is row-local on
    * the single scan; the whole pipeline costs exactly TWO shuffles —
    * the fingerprint window and the per-language packing window —
    * regardless of how many screens are stacked. That composition is
    * the Spark-first answer to the reference's per-resource Python
    * loops: at 100 TB, N separate screening jobs = N scans; this is
    * one.
    */
  def corpusPipeline(docs: DataFrame, rateBpByLang: Seq[(String, Int)],
                     defaultBp: Int, budgetPerLang: Long): DataFrame = {
    val scored = withScreenColumns(
      TextAnalysis.withPredictedLang(docs), rateBpByLang, defaultBp)
      .withColumn("n_tokens", tokenCountCol)
    val byLang = Window.partitionBy("lang")
      .orderBy(col("alpha_bp").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("keep_dedup", keepDedupCol)
      .withColumn("pre_keep", col("is_quality") && col("keep_dedup") && col("sampled"))
      .withColumn("cum_tokens",
        sum(when(col("pre_keep"), col("n_tokens")).otherwise(0L)).over(byLang))
      .withColumn("keep", col("pre_keep") && col("cum_tokens") <= budgetPerLang)
      .select("doc_id", "lang", "predicted_lang", "n_tokens", "is_quality",
        "keep_dedup", "sampled", "cum_tokens", "keep")
      .orderBy("doc_id")
  }

  /** q60: the CORPUS CARD — the composition report a corpus release
    * ships with: per source × language (with rollup totals) document
    * and token counts plus screen pass-rates in basis points. Derived
    * from the SAME verdict expressions as the q55 pipeline
    * ([[withScreenColumns]]), so the card cannot drift from what the
    * pipeline actually keeps. One scan + the fingerprint window + one
    * ROLLUP aggregate (two shuffles total at any corpus size). ROLLUP
    * goes through SQL for the same Spark 4.1 reason as q08 (Dataset
    * .rollup re-tags grouping attributes under the Expand node). */
  def corpusCard(docs: DataFrame, rateBpByLang: Seq[(String, Int)],
                 defaultBp: Int): DataFrame = {
    val scored = withScreenColumns(docs, rateBpByLang, defaultBp)
      .withColumn("n_tokens", tokenCountCol)
      .withColumn("keep_dedup", keepDedupCol)
      .select("source", "lang", "n_tokens", "is_quality", "keep_dedup", "sampled")
    scored.createOrReplaceTempView("graft_corpus_card_src")
    scored.sparkSession.sql(
      """SELECT coalesce(source, '(all)') AS source,
        |       coalesce(lang, '(all)') AS lang,
        |       count(1) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |       (10000 * sum(CASE WHEN is_quality THEN 1 ELSE 0 END)) DIV count(1) AS quality_bp,
        |       (10000 * sum(CASE WHEN keep_dedup THEN 1 ELSE 0 END)) DIV count(1) AS dedup_keep_bp,
        |       (10000 * sum(CASE WHEN sampled THEN 1 ELSE 0 END)) DIV count(1) AS sampled_bp
        |FROM graft_corpus_card_src
        |GROUP BY ROLLUP (source, lang)
        |ORDER BY 1, 2""".stripMargin)
  }

  /** q49: token-budget packing — greedily fill a per-language token
    * budget with the highest-quality documents first (alpha ratio from
    * the q38 scorer, doc_id tiebreak → total order), via a running sum
    * over one window. One shuffle on lang; at 100 TB the per-language
    * running sum is the standard "cut the corpus at N tokens" step.
    * Token counts use the q39 BPE-ish segmentation. */
  def tokenBudgetPack(docs: DataFrame, budgetPerLang: Long): DataFrame = {
    val d = docs.select(col("doc_id"), col("lang"),
      tokenCountCol.as("n_tokens"),
      length(col("text")).cast(LongType).as("n_chars"),
      length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast(LongType).as("n_alpha"))
      .withColumn("alpha_bp", expr("(10000 * n_alpha) DIV nullif(n_chars, 0)"))
    val w = Window.partitionBy("lang")
      .orderBy(col("alpha_bp").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budgetPerLang)
      .select("lang", "doc_id", "n_tokens", "cum_tokens")
      .orderBy("lang", "doc_id")
  }
}

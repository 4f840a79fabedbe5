package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-corpus analysis operators for LLM-training-data pipelines
  * (SURVEY.md §2C): language ID, quality scoring, token counting,
  * content fingerprinting, exact dedup.
  *
  * Everything is built from codegen'd builtins (length/replace/regexp/
  * split/md5) — no UDFs — so the scan stays inside whole-stage codegen
  * and the operators hold up on a 100 TB corpus. Integer arithmetic
  * (DIV, basis points) instead of floating division keeps results
  * hash-identical to the oracle.
  */
object TextAnalysis {

  /** language → marker word (padded with spaces; all markers compared
    * by occurrence count, ties broken in declaration order). */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> " the ", "de" -> " und ", "es" -> " los ",
    "fr" -> " les ", "zh" -> " 的 ")

  /** per-document marker-count language prediction, appended as a
    * `predicted_lang` column — shared by q37 (confusion counts), q46
    * (declared-vs-content consistency) and the q55 composite pipeline. */
  private[operators] def withPredictedLang(documents: DataFrame): DataFrame = {
    val withP = documents.withColumn("__p", concat(lit(" "), col("text"), lit(" ")))
    val withCounts = LangMarkers.foldLeft(withP) { case (df, (l, m)) =>
      df.withColumn(s"c_$l",
        expr(s"(length(__p) - length(replace(__p, '$m', ''))) DIV ${m.length}"))
    }
    val langs = LangMarkers.map(_._1)
    val pred = langs.dropRight(1).zipWithIndex.foldLeft(when(lit(false), "")) {
      case (acc, (l, i)) =>
        val rest = langs.drop(i + 1).map(r => col(s"c_$r"))
        val restMax = if (rest.size == 1) rest.head else greatest(rest: _*)
        acc.when(col(s"c_$l") >= restMax, l)
    }.otherwise(langs.last)
    withCounts.withColumn("predicted_lang", pred)
      .drop("__p" +: langs.map(l => s"c_$l"): _*)
  }

  /** q37: n-gram-heuristic language ID → confusion counts vs the
    * labelled lang column. */
  def langId(documents: DataFrame): DataFrame =
    withPredictedLang(documents)
      .groupBy("lang", "predicted_lang")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted_lang")

  /** q46: content-vs-declared-metadata consistency — the reference's
    * declared-stimulus vs decoded-content checks (reference
    * src/trace/fix/check_image_stimulus_match.py,
    * check_nwb_stimulus_match.py) re-expressed over documents: compare
    * the declared lang/n_chars metadata against what the content
    * itself says, list only the disagreeing rows. Row-local compute on
    * one scan; the only exchange is the output sort. Binary twin: q80
    * ([[Traces.sweepConsistency]]) runs the same declared-vs-computed
    * check against DECODED SAMPLE CONTENT instead of text. */
  def contentMetadataCheck(documents: DataFrame): DataFrame =
    withPredictedLang(documents)
      .select(col("doc_id"), col("lang"), col("predicted_lang"),
        col("n_chars"), length(col("text")).cast(LongType).as("computed_chars"))
      .withColumn("lang_match", col("lang") === col("predicted_lang"))
      .withColumn("chars_match", col("n_chars") === col("computed_chars"))
      .filter(!col("lang_match") || !col("chars_match"))
      .orderBy("doc_id")

  /** q38: quality scoring — length, alpha/punct ratios in integer basis
    * points, stopword presence, boolean keep-flag. */
  def qualityScore(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        length(col("text")).cast(LongType).as("n_chars"),
        length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast(LongType).as("n_alpha"),
        length(regexp_replace(col("text"), "[^.,;:!?]", "")).cast(LongType).as("n_punct"),
        expr("(length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) DIV 5")
          .cast(LongType).as("n_stopword_the"))
      .withColumn("alpha_bp", expr("(10000 * n_alpha) DIV nullif(n_chars, 0)"))
      .withColumn("is_quality",
        col("n_chars").between(50, 20000) && col("alpha_bp") > 6000)
      .orderBy("doc_id")

  /** q39: token counting — whitespace tokens, distinct tokens, and a
    * BPE-ish regex segmentation (letter runs / digit runs / single
    * punctuation). */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        size(split(trim(col("text")), " +")).cast(LongType).as("n_ws_tokens"),
        size(array_distinct(split(trim(col("text")), " +"))).cast(LongType).as("n_distinct_tokens"),
        expr("size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0))")
          .cast(LongType).as("n_bpe_tokens"))
      .orderBy("doc_id")

  /** repetition flag thresholds (basis points) — shared with the q54
    * oracle SQL so both engines cut at the same literals. The shape
    * follows the published MassiveText/Gopher repetition filters
    * (top-n-gram share, duplicate-n-gram share), re-based to word
    * n-grams since this corpus has no line structure. */
  val TopTokenMaxBp = 1000L
  val Top2GramMaxBp = 2000L
  val Dup3GramMaxBp = 3000L

  /** q54: repetition-quality screen — share of the most frequent
    * token, share of the most frequent word 2-gram, duplicate word
    * 3-gram share, each in integer basis points, plus the keep flag.
    * Everything is row-local: per n-gram size one codegen kernel pass
    * (shingle hashes → sort+run-scan frequency stats, no explode, no
    * shuffle of n-gram rows), so the operator is a single corpus scan
    * plus the output sort — the shape that survives 100 TB, where an
    * explode+groupBy over 3-grams would shuffle 3× the corpus token
    * count. */
  def repetitionScreen(documents: DataFrame): DataFrame = {
    def stats(k: Int) = graft.functions.HashExpressions.array_freq_stats(
      Dedup.shingleHashes(col("text"), k))
    documents
      .select(col("doc_id"), stats(1).as("s1"), stats(2).as("s2"), stats(3).as("s3"))
      .select(col("doc_id"),
        expr("(10000 * s1[2]) DIV nullif(s1[0], 0)").as("top_token_bp"),
        expr("(10000 * s2[2]) DIV nullif(s2[0], 0)").as("top_2gram_bp"),
        expr("(10000 * (s3[0] - s3[1])) DIV nullif(s3[0], 0)").as("dup_3gram_bp"))
      .withColumn("is_repetitive",
        col("top_token_bp") > TopTokenMaxBp ||
          col("top_2gram_bp") > Top2GramMaxBp ||
          col("dup_3gram_bp") > Dup3GramMaxBp)
      .orderBy("doc_id")
  }

  /** canonical form used for fingerprinting: lowercase, strip
    * non-alphanumerics, collapse whitespace. */
  def canonicalText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  /** the ONE definition of a document's content fingerprint — q40 and
    * q42 (and their oracle SQL) must agree on what counts as a dup. */
  def fingerprintCol(text: Column): Column =
    md5(canonicalText(text).cast(BinaryType))

  /** q40: content fingerprint + how many docs share it — near-dup at
    * the "same text modulo punctuation" level. Class sizes come from a
    * map-side-partial groupBy + join ([[Scale.keyAggJoin]]), not a
    * fingerprint window: a boilerplate page duplicated 10⁶× would put
    * its whole class into one window task, while the groupBy combines
    * it to one row per map task and the join is AQE-skew-splittable. */
  def fingerprint(documents: DataFrame): DataFrame = {
    val fp = documents
      .select(col("doc_id"), fingerprintCol(col("text")).as("fingerprint"))
    Scale.keyAggJoin(fp, Seq("fingerprint"),
        Seq(count(lit(1)).as("n_same_fingerprint")))
      .orderBy("doc_id")
  }

  /** q30: exact dedup via content hash — group identical texts, elect
    * the smallest doc_id as canonical (hash-groupBy; at 100 TB this is
    * one shuffle on a 16-byte key). */
  def exactDedup(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text").cast(BinaryType)).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("canonical_id"))
      .orderBy("content_hash")

  /** q42: apply the dedup policy — the retained training corpus. Each
    * canonical-fingerprint group keeps its smallest doc_id; everything
    * else is marked dropped. Winner election is the q83 groupBy+join
    * shape ([[Scale.keyAggJoin]]): the hot fingerprint class combines
    * map-side before the exchange instead of serializing through one
    * window task. */
  def dedupedCorpus(documents: DataFrame): DataFrame = {
    val fp = documents
      .select(col("doc_id"), fingerprintCol(col("text")).as("fingerprint"))
    Scale.keyAggJoin(fp, Seq("fingerprint"),
        Seq(min(col("doc_id")).as("__winner")))
      .withColumn("keep", col("doc_id") === col("__winner"))
      .drop("__winner")
      .orderBy("doc_id")
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.BpeExpressions

/** BPE tokenizer induction + application (SURVEY.md §2C, q85/q85b) —
  * the canonical LLM-preprocessing step this engine was missing:
  * training a subword vocabulary ON the corpus and tokenizing the
  * corpus WITH it (Sennrich et al. 2016, the GPT/Llama tokenizer
  * family's training loop).
  *
  * Scale shape (the driver-side-Lloyd discipline, measured cheapest in
  * r7): the corpus pays ONE scan to aggregate the word-frequency table
  * (map-side-combined groupBy on the word — the standard tokenizer-
  * training reduction), which a TakeOrdered selection bounds to the
  * top-[[VocabWords]] words by (count desc, word asc). The merge loop
  * then runs driver-side over that BOUNDED table — per round: count
  * adjacent symbol pairs weighted by word frequency, pick the argmax
  * (count desc, pair asc), greedily rewrite each word's symbols — and
  * the corpus never participates again until the frozen merge list
  * rides back as an expression literal for the row-local apply scan
  * (zero exchanges; [[BpeExpressions.BpeStats]]). Everything is exact
  * integer arithmetic, so the DuckDB oracle replays vocabulary → every
  * round's pair table → argmax → run-parity greedy rewrite → per-doc
  * token counts bit-for-bit.
  */
object Bpe {

  /** induction-table bound: top-V words by corpus frequency. A pure
    * modulus-free deterministic rule (count desc, word asc) — the
    * standard practice of training BPE on the word-frequency table,
    * with the table capped so the driver-side loop stays O(V·K) no
    * matter the corpus size. */
  val VocabWords = 64

  /** maximum merge rounds (the vocabulary-size budget). */
  val MaxMerges = 8

  /** a pair must occur at least this often (frequency-weighted) to be
    * merged — stop below it, and once a round selects nothing every
    * later round sees the identical pair table, so ranks 1..R are
    * contiguous in both engines. */
  val MinPairCount = 2L

  final case class Merge(rank: Int, left: String, right: String, pairN: Long)

  /** binary UTF-8 comparison (what Spark's UTF8String and DuckDB's
    * default collation both use). */
  private def utf8Cmp(a: String, b: String): Int =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))

  /** the bounded word-frequency table: one corpus scan, map-side
    * combined, TakeOrdered selection. */
  private[graft] def vocabulary(docs: DataFrame): Seq[(String, Long)] =
    docs
      .select(explode(Dedup.tokens(coalesce(col("text"), lit("")))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(VocabWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  /** driver-side merge induction over the bounded vocabulary. */
  private[graft] def trainMerges(vocab: Seq[(String, Long)]): Seq[Merge] = {
    var table: Seq[(Array[String], Long)] =
      vocab.map { case (w, c) => (BpeExpressions.codePointSyms(w), c) }
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= MaxMerges && !done) {
      val counts = scala.collection.mutable.LinkedHashMap.empty[(String, String), Long]
      table.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      val best = counts.toSeq
        .filter(_._2 >= MinPairCount)
        .sortWith { case (((l1, r1), n1), ((l2, r2), n2)) =>
          // tie-break in UTF-8 BYTE order, not Java UTF-16 order: the
          // oracle's ORDER BY and vocabulary()'s Spark orderBy both
          // compare binary UTF-8, and the two orders disagree between
          // supplementary code points and U+E000..U+FFFF
          if (n1 != n2) n1 > n2
          else {
            val c = utf8Cmp(l1, l2)
            if (c != 0) c < 0 else utf8Cmp(r1, r2) < 0
          }
        }
        .headOption
      best match {
        case None => done = true
        case Some(((l, r), n)) =>
          merges += Merge(rank, l, r, n)
          table = table.map { case (syms, c) =>
            (BpeExpressions.applyMerge(syms, l, r, l + r), c)
          }
          rank += 1
      }
    }
    merges.result()
  }

  /** q85: the learned merge table (the model artifact — rank order IS
    * the apply order; bounded at [[MaxMerges]] rows). */
  def mergeTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    trainMerges(vocabulary(docs))
      .map(m => (m.rank, m.left, m.right, m.left + m.right, m.pairN))
      .toDF("rank", "left_sym", "right_sym", "merged", "pair_n")
      .orderBy("rank")
  }

  /** the row-local scoring core shared by the batch query and the
    * ingest-stream twin (stateless: the frozen merge list rides as an
    * expression literal, nothing keyed, nothing stateful). */
  def tokenizeStatsRowLocal(docs: DataFrame,
                            merges: Seq[(String, String)]): DataFrame =
    docs
      .select(col("doc_id"), BpeExpressions.bpe_stats(
        Dedup.tokens(coalesce(col("text"), lit(""))), merges).as("st"))
      .select(col("doc_id"), col("st.n_words").as("n_words"),
        col("st.n_syms").as("n_syms"), col("st.n_bpe").as("n_bpe"))
      .withColumn("comp_bp", expr("(10000 * n_bpe) DIV nullif(n_syms, 0)"))

  /** q85b: tokenize the corpus with the induced merges — one row-local
    * scan against the frozen model (per-doc word/codepoint/BPE-token
    * counts + compression in bp of the initial symbol count). */
  def tokenizeStats(docs: DataFrame): DataFrame =
    tokenizeStatsRowLocal(docs,
      trainMerges(vocabulary(docs)).map(m => (m.left, m.right)))
      .orderBy("doc_id")

  /** q105b: TOKENIZER FERTILITY under the TRAINED tokenizer — q105's
    * regex segmentation priced the fixed pre-tokenizer; this is the
    * number that actually moves when the q85 BPE vocabulary is
    * retrained: per language, BPE tokens per word (Q20) and the
    * corpus-level compression of the initial codepoint stream (bp).
    * The domain is docs with ≥1 word (both engines drop wordless
    * docs — the q85b oracle's join semantics, here made explicit).
    * Shape: the ONE q85b scoring scan against the frozen merges, a
    * doc-keyed metadata join, one map-side-combined rollup; ratios
    * widen through DECIMAL(38,0) (the q62/q105 discipline). */
  def bpeFertility(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"))
      .join(tokenizeStatsRowLocal(docs,
        trainMerges(vocabulary(docs)).map(m => (m.left, m.right)))
        .filter(col("n_words") > 0), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("total_words"),
        sum(col("n_syms")).as("total_syms"),
        sum(col("n_bpe")).as("total_bpe"),
        expr("CAST(CAST(sum(n_bpe) AS DECIMAL(38,0)) * 1048576 div " +
          "nullif(CAST(sum(n_words) AS DECIMAL(38,0)), 0) AS BIGINT)")
          .as("fertility_q20"),
        expr("CAST((10000 * CAST(sum(n_bpe) AS DECIMAL(38,0))) div " +
          "nullif(CAST(sum(n_syms) AS DECIMAL(38,0)), 0) AS BIGINT)")
          .as("compression_bp"))
      .orderBy("lang")
}

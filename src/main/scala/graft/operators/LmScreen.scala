package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model perplexity screen (q100) — the SEQUENCE-model
  * sibling of q75's unigram Zipf screen, completing the classic
  * quality-filter pair a large-scale training-data pipeline runs
  * (CCNet/Gopher score documents with an n-gram LM trained on a
  * trusted reference slice and cut the high-perplexity tail; the
  * reference repo's recurring shape is the same — content judged
  * against a model built from a curated slice, e.g.
  * /root/reference/src/trace/fix/check_nwb_stimulus_match.py).
  *
  * Semantics: a bigram model with Laplace smoothing is trained on the
  * frozen TRAIN slice (doc_id % [[TrainMod]] == 0 — standing in for
  * the curated reference corpus); the vocabulary is the top-[[VocabK]]
  * train tokens under the TOTAL order (count desc, token asc), every
  * other token maps to the `<unk>` class. Every document (train or
  * not) is then scored: per bigram (w₁,w₂),
  * surprisal = log2( (c(w₁)+V+1) / (c(w₁,w₂)+1) ) with train-slice
  * bigram/context counts and V+1 the smoothing domain (vocab + unk);
  * per document the bigram count, total surprisal and per-bigram mean,
  * cut against [[KeepMaxMb]].
  *
  * EXACTNESS — the fixed-point log2 kernel
  * ([[graft.functions.LogExpressions]], a codegen Catalyst
  * Expression). Perplexity is irrational and cross-engine float logs
  * do not hash-match, so the surprisal is DEFINED in 1/1024-bit units
  * ("mb") by an int64-only floor algorithm both engines replay
  * digit-for-digit — exponent cascade, restoring-division mantissa,
  * log-by-repeated-squaring fraction — exact on the FULL count domain
  * b < 2⁶² (the division recurrence never forms the b·2³⁰ product
  * that would overflow int64). The DuckDB oracle carries the same
  * unrolled steps as chained CTEs ([[log2mbSqlCtes]]).
  *
  * Scale shape: the kernel runs on MODEL-sized frames only (≤ (K+1)²
  * bigram rows + K+1 contexts + 1), never on the document stream.
  * Train token counts hash-shuffle a bounded token domain with
  * map-side combine; the vocabulary election is a K-bounded
  * TakeOrdered (the distributed top-K plan: per-partition heaps, K
  * rows to the driver); bigram construction is a row-local array zip
  * (no positional self-join); mapped bigram counts collapse map-side
  * to ≤ (K+1)² rows. Scoring = vocab/model broadcast joins + one
  * map-side-combined doc_id aggregate — nothing data-sized ever
  * shuffles on a token key.
  */
object LmScreen {

  /** train slice: doc_id % TrainMod == 0 (a frozen 20% reference
    * corpus stand-in). */
  val TrainMod = 5

  /** vocabulary size: top-K train tokens by (count desc, token asc). */
  val VocabK = 16

  /** fractional bits of the fixed-point log2 (1/1024-bit units). */
  val FracBits = 10

  /** keep fence: mean surprisal per bigram ≤ this many 1/1024 bits —
    * sits at the corpus's third quartile (sf0.01 avg_mb: q25 3028,
    * median 3223, q75 3410, max 4367), so the screen genuinely cuts
    * the high-perplexity tail at every SF rather than waving
    * everything through. */
  val KeepMaxMb = 3400L

  /** the OOV class token. A literal `<unk>` corpus token would merge
    * into the class — at worst that token is charged the class's
    * smoothed cost, which is already OOV's semantics. */
  val UnkTok = "<unk>"

  /** exponent cascade steps for d = b DIV a < 2⁶²: compare-and-halve
    * producing k = ⌊log2 d⌋ and p = 2ᵏ via literal shifts only (the
    * oracle's spelling of the kernel's numberOfLeadingZeros). */
  val ExpSteps: Seq[Int] = Seq(32, 16, 8, 4, 2, 1)

  /** restoring-division steps: bits of the Q0.30 mantissa fraction. */
  val DivBits = 30

  /** floor-semantics fixed-point log2(b/a) in 1/1024-bit units,
    * appended as column `out` — the codegen kernel
    * [[graft.functions.LogExpressions.log2mb]]. */
  def withLog2mb(df: DataFrame, a: Column, b: Column, out: String): DataFrame =
    df.withColumn(out, graft.functions.LogExpressions.log2mb(a, b))

  // ---------------------------------------------------------------
  // the kernel, oracle side: chained-CTE text over a source CTE that
  // carries int64 columns `a`, `b` (1 ≤ a ≤ b < 2⁶²) plus `keyCols`;
  // final CTE `surp` has (keys..., mb). Spliced into
  // SparkEntry.lmScreenSql. Every step is int64 +, ×, floor-DIV and
  // comparisons — no product ever exceeds 2⁶³ (the restoring division
  // doubles a remainder < 2⁶² instead of forming b·2³⁰).
  // ---------------------------------------------------------------

  def log2mbSqlCtes(srcCte: String, keyCols: Seq[String]): String = {
    val ks = keyCols.mkString(", ")
    val norm =
      s"""kc0 AS (SELECT $ks, a, b, b // a AS rest,
         |  CAST(0 AS BIGINT) AS k, CAST(1 AS BIGINT) AS p FROM $srcCte)""".stripMargin
    val exp = ExpSteps.zipWithIndex.map { case (s, i) =>
      s"""kc${i + 1} AS (SELECT $ks, a, b,
         |  CASE WHEN rest >= ${1L << s} THEN rest // ${1L << s} ELSE rest END AS rest,
         |  k + CASE WHEN rest >= ${1L << s} THEN $s ELSE 0 END AS k,
         |  p * CASE WHEN rest >= ${1L << s} THEN ${1L << s} ELSE 1 END AS p FROM kc$i)""".stripMargin
    }
    val dv0 =
      s"""dv0 AS (SELECT $ks, k, a * p AS dd, b - a * p AS rem,
         |  CAST(0 AS BIGINT) AS facc FROM kc${ExpSteps.length})""".stripMargin
    val dv = (1 to DivBits).map { i =>
      s"""dv$i AS (SELECT $ks, k, dd,
         |  CASE WHEN rem * 2 >= dd THEN rem * 2 - dd ELSE rem * 2 END AS rem,
         |  facc * 2 + (CASE WHEN rem * 2 >= dd THEN 1 ELSE 0 END) AS facc FROM dv${i - 1})""".stripMargin
    }
    val lg0 =
      s"""lg0 AS (SELECT $ks, k, ${1L << DivBits} + facc AS r,
         |  CAST(0 AS BIGINT) AS acc FROM dv$DivBits)""".stripMargin
    val frac = (1 to FracBits).map { i =>
      s"""lg$i AS (SELECT $ks, k,
         |  CASE WHEN ((r * r) // ${1L << DivBits}) >= ${1L << 31}
         |       THEN ((r * r) // ${1L << DivBits}) // 2 ELSE ((r * r) // ${1L << DivBits}) END AS r,
         |  acc * 2 + (CASE WHEN ((r * r) // ${1L << DivBits}) >= ${1L << 31} THEN 1 ELSE 0 END) AS acc
         |  FROM lg${i - 1})""".stripMargin
    }
    val fin =
      s"surp AS (SELECT $ks, CAST(k * ${1L << FracBits} + acc AS BIGINT) AS mb FROM lg$FracBits)"
    (Seq(norm) ++ exp ++ Seq(dv0) ++ dv ++ Seq(lg0) ++ frac :+ fin).mkString(",\n")
  }

  // ---------------------------------------------------------------
  // operator
  // ---------------------------------------------------------------

  /** whitespace tokens under the dedup-family canonicalization (null
    * text canonicalizes to the empty string — one empty token, zero
    * bigrams — so the sentinel row below still surfaces the doc). */
  private def tokCol: Column = split(trim(lower(coalesce(col("text"), lit("")))), " +")

  /** bigram pair structs: an index transform over the token array —
    * ascending sequence sliced so 0/1-token docs yield no pairs. */
  private val BigramsExpr =
    "transform(slice(sequence(0, size(tk)), 1, greatest(size(tk) - 1, 0)), i -> struct(tk[i] AS t1, tk[i + 1] AS t2, false AS is_doc))"

  /** one sentinel struct per document, prepended to the pair array —
    * it carries the document through the explode+aggregate so the
    * 0-bigram docs surface WITHOUT a join-back to the corpus (one scan
    * instead of two scans + a data-sized doc_id join). */
  private val SentinelExpr =
    "struct(CAST(NULL AS STRING) AS t1, CAST(NULL AS STRING) AS t2, true AS is_doc)"

  /** (doc_id [, carry...], m1, m2, is_doc) mapped-bigram stream with
    * the per-doc sentinel row; the vocab joins are broadcast (one
    * exchange, reused for both sides), the explode row-local. `gk` =
    * model grouping columns (empty: one global model; Seq("lang"):
    * one model per language — vocab membership is then per-group). */
  private def mappedBigrams(docs: DataFrame, vocab: DataFrame, gk: Seq[String],
                            carry: Seq[String] = Nil, sentinel: Boolean = false): DataFrame = {
    val pairs = if (sentinel) s"concat(array($SentinelExpr), $BigramsExpr)" else BigramsExpr
    val keep = (gk ++ carry.filterNot(gk.contains)).distinct
    docs.select(col("doc_id") +: keep.map(col) :+ tokCol.as("tk"): _*)
      .select(col("doc_id") +: keep.map(col) :+ explode(expr(pairs)).as("bg"): _*)
      .select(col("doc_id") +: keep.map(col) :+ col("bg.t1").as("t1") :+
        col("bg.t2").as("t2") :+ col("bg.is_doc").as("is_doc"): _*)
      .join(broadcast(vocab.select(gk.map(col) :+ col("tok").as("t1") :+ lit(1).as("__v1"): _*)),
        gk :+ "t1", "left")
      .join(broadcast(vocab.select(gk.map(col) :+ col("tok").as("t2") :+ lit(1).as("__v2"): _*)),
        gk :+ "t2", "left")
      .select(col("doc_id") +: keep.map(col) :+
        when(col("__v1").isNotNull, col("t1")).otherwise(lit(UnkTok)).as("m1") :+
        when(col("__v2").isNotNull, col("t2")).otherwise(lit(UnkTok)).as("m2") :+
        col("is_doc"): _*)
  }

  /** the LAZY vocabulary-election frame — top-[[VocabK]] train tokens
    * under the total (count desc, token asc) order, via the K-bounded
    * distributed top-K (global: TakeOrdered; grouped: the bounded-heap
    * TopKPerKey). Exposed so PlanShapeSpec can pin the election shape
    * now that [[model]] collects its result. */
  private[graft] def vocabElection(docs: DataFrame, gk: Seq[String]): DataFrame = {
    val train = docs.filter(pmod(col("doc_id"), lit(TrainMod.toLong)) === 0)
    val counts = train
      .select(gk.map(col) :+ explode(tokCol).as("tok"): _*)
      .groupBy(gk :+ "tok" map col: _*).agg(count(lit(1)).as("cnt"))
    (if (gk.isEmpty) counts.orderBy(col("cnt").desc, col("tok").asc).limit(VocabK)
     else graft.plans.TopKPerKey(counts, gk.map(col),
       Seq(col("cnt").desc, col("tok").asc), VocabK))
      .select(gk :+ "tok" map col: _*)
  }

  /** the trained model: (vocab, pair surprisal, context surprisal for
    * unseen pairs, unseen-context surprisal) — all model-sized (each
    * frame gains the `gk` columns when grouped); callers broadcast.
    * The grouped vocabulary election runs on the repo's bounded-heap
    * TopKPerKey operator (per-partition heaps, ≤ K rows per group to
    * the final stage) — the global one on TakeOrdered.
    *
    * NOTE (r19 semantics): building the model EXECUTES Spark jobs at
    * construction time — vocab and pair counts are collected and
    * re-entered as local relations (see [[Scale.localized]]), so
    * callers pay the training scans when they call this, not at first
    * action, and the local relations snapshot source state as of the
    * build. */
  private[operators] def model(docs: DataFrame, gk: Seq[String] = Nil)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    // every frame built here is MODEL-sized (≤ (K+1)² rows per group) —
    // collect the two that anchor corpus scans (vocab election, mapped
    // bigram counts) and re-enter them as local relations: left lazy,
    // every downstream broadcast re-executes the full train-scan
    // lineage per use (the q100 before-plan embedded the training
    // subtree repeatedly — 32 exchanges / 15 corpus scans; q100b worse,
    // with the per-lang TopKPerKey election re-run per broadcast).
    // Still computed from the parquet inputs on every invocation —
    // nothing persists across runs.
    def localize(df: DataFrame): DataFrame = Scale.localized(df)
    val train = docs.filter(pmod(col("doc_id"), lit(TrainMod.toLong)) === 0)
    val vocab = localize(vocabElection(docs, gk))
    val pairCounts = localize(mappedBigrams(train, vocab, gk)
      .filter(!col("is_doc"))
      .groupBy(gk ++ Seq("m1", "m2") map col: _*).agg(count(lit(1)).as("c2")))
    val ctxCounts = pairCounts
      .groupBy(gk :+ "m1" map col: _*).agg(sum("c2").as("c1"))
    // V+1: vocab classes + unk — the Laplace smoothing domain, per group
    val vd =
      if (gk.isEmpty) vocab.agg((count(lit(1)) + lit(1L)).as("vd"))
      else vocab.groupBy(gk.map(col): _*).agg((count(lit(1)) + lit(1L)).as("vd"))
    // every frame here is model-sized — hint broadcast so the builder
    // never plans a shuffle join for a ≤ (K+1)²-row table
    def withVd(df: DataFrame): DataFrame =
      if (gk.isEmpty) df.crossJoin(vd) else df.join(broadcast(vd), gk)
    val pairModel = withLog2mb(
      withVd(pairCounts.join(broadcast(ctxCounts), gk :+ "m1")),
      col("c2") + 1L, col("c1") + col("vd"), "mb")
      .select(gk ++ Seq("m1", "m2", "mb") map col: _*)
    val ctxModel = withLog2mb(withVd(ctxCounts),
      lit(1L), col("c1") + col("vd"), "ctx_mb")
      .select(gk ++ Seq("m1", "ctx_mb") map col: _*)
    val unkModel = withLog2mb(vd, lit(1L), col("vd"), "unk_mb")
      .select(gk :+ "unk_mb" map col: _*)
    (vocab, pairModel, ctxModel, unkModel)
  }

  /** The collected LM model — bounded ((K+1)² pairs + K+1 contexts +
    * 1), a broadcast-sized object like the IVF centroids or the q75
    * vocabulary, NOT a data-scale collect. Train batch-side on a
    * released corpus, freeze, then score an ingest stream row-locally
    * with [[graft.streaming.DocStreams.lmLookup]]. Pair keys join the
    * two classes with a single space — tokens cannot contain one
    * (they come from a split on spaces). */
  case class LmModel(vocab: Set[String], pairMb: Map[String, Long],
                     ctxMb: Map[String, Long], unkMb: Long)

  /** Row-local scoring against a FROZEN collected model, appended as
    * `lm_n_bigrams` / `lm_total_mb` / `lm_avg_mb` / `lm_keep` columns
    * (all other columns ride through): vocabulary fold, pair / context
    * / unseen surprisal lookups and the per-doc mean, one aggregate
    * expression over the token array — no explode, no state, no
    * shuffle. Shared by the q101-family stream twin
    * [[graft.streaming.DocStreams.lmLookup]] and the decode-once
    * [[TextAnalysis.docReport]] frame. */
  def lmScoreRowLocal(docs: DataFrame, model: LmModel): DataFrame =
    docs
      .withColumn("__lm_pm", map_from_arrays(
        typedlit(model.pairMb.keys.toSeq), typedlit(model.pairMb.values.toSeq)))
      .withColumn("__lm_cm", map_from_arrays(
        typedlit(model.ctxMb.keys.toSeq), typedlit(model.ctxMb.values.toSeq)))
      .withColumn("__lm_vs", typedlit(model.vocab.toSeq))
      .withColumn("__lm_tk", expr("split(trim(lower(coalesce(text, ''))), ' +')"))
      .withColumn("__lm_m", expr(
        s"transform(__lm_tk, t -> CASE WHEN array_contains(__lm_vs, t) THEN t ELSE '$UnkTok' END)"))
      .withColumn("lm_n_bigrams",
        expr("CAST(greatest(size(__lm_tk) - 1, 0) AS BIGINT)"))
      .withColumn("lm_total_mb", expr(
        s"""CASE WHEN size(__lm_tk) >= 2 THEN
           |  aggregate(sequence(0, size(__lm_tk) - 2), CAST(0 AS BIGINT), (acc, i) ->
           |    acc + coalesce(element_at(__lm_pm, concat(__lm_m[i], ' ', __lm_m[i + 1])),
           |                   element_at(__lm_cm, __lm_m[i]),
           |                   CAST(${model.unkMb} AS BIGINT))) END""".stripMargin))
      .withColumn("lm_avg_mb",
        when(col("lm_n_bigrams") > 0, expr("lm_total_mb DIV lm_n_bigrams")))
      .withColumn("lm_keep",
        col("lm_n_bigrams") > 0 && col("lm_avg_mb") <= KeepMaxMb)
      .drop("__lm_pm", "__lm_cm", "__lm_vs", "__lm_tk", "__lm_m")

  def lmModel(docs: DataFrame): LmModel = {
    val (vocab, pairModel, ctxModel, unkModel) = model(docs, Nil)
    LmModel(
      vocab.collect().map(_.getString(0)).toSet,
      pairModel.collect()
        .map(r => s"${r.getString(0)} ${r.getString(1)}" -> r.getLong(2)).toMap,
      ctxModel.collect().map(r => r.getString(0) -> r.getLong(1)).toMap,
      unkModel.collect().headOption.map(_.getLong(0)).getOrElse(0L))
  }

  /** q100: the per-document LM screen (see object doc). Columns:
    * doc_id, lang, n_bigrams, total_mb, avg_mb (total_mb/avg_mb null
    * when the document has < 2 tokens), keep. */
  def lmScreen(docs: DataFrame): DataFrame =
    lmScreenScored(docs, Nil)
      .withColumn("keep",
        col("n_bigrams") > 0 && col("avg_mb") <= KeepMaxMb)
      .orderBy("doc_id")

  /** q100b: the PER-LANGUAGE screen — the deployed CCNet shape: one
    * bigram model per language (per-language vocabulary via the
    * bounded-heap TopKPerKey election, per-language counts and
    * smoothing domain), each document scored against ITS language's
    * model. A multilingual corpus scored against one global model
    * conflates "rare language" with "low quality"; per-language models
    * make the fence comparable across languages. Documents of a
    * language absent from the train slice score 0 (an empty model has
    * nothing to be surprised by — they pass, flagged by n_bigrams as
    * usual). Same columns as q100. */
  def lmScreenPerLang(docs: DataFrame): DataFrame =
    lmScreenScored(docs, Seq("lang"))
      .withColumn("keep",
        col("n_bigrams") > 0 && col("avg_mb") <= KeepMaxMb)
      .orderBy("doc_id")

  /** the unordered scoring core — ONE corpus scan: the per-doc
    * sentinel row rides the bigram explode, so 0-bigram documents
    * surface from the same map-side-combined aggregate (no join-back,
    * no second scan). `gk` keys the model (empty = global). */
  private def lmScreenScored(docs: DataFrame, gk: Seq[String]): DataFrame = {
    val (vocab, pairModel, ctxModel, unkModel) = model(docs, gk)
    val joined = mappedBigrams(docs, vocab, gk, carry = Seq("lang"), sentinel = true)
      .join(broadcast(pairModel), gk ++ Seq("m1", "m2"), "left")
      .join(broadcast(ctxModel), gk :+ "m1", "left")
    val withUnk =
      if (gk.isEmpty) joined.crossJoin(broadcast(unkModel))
      else joined.join(broadcast(unkModel), gk, "left")
    withUnk
      .select(col("doc_id"), col("lang"),
        when(col("is_doc"), lit(null).cast("long"))
          // the final 0: a group with no trained model at all (possible
          // only in the grouped form) — surprisal 0 by definition
          .otherwise(coalesce(col("mb"), col("ctx_mb"), col("unk_mb"), lit(0L)))
          .as("s_mb"))
      .groupBy("doc_id", "lang")
      .agg(count(col("s_mb")).as("n_bigrams"), sum("s_mb").as("total_mb"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"), col("total_mb"),
        when(col("n_bigrams") > 0, expr("total_mb DIV n_bigrams")).as("avg_mb"))
  }
}

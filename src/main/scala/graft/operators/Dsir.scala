package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance reweighting (q101) and importance resampling
  * (q101b) — the DATA-SELECTION pair completing the quality-screen
  * family: q75 scores rarity (unigram Zipf), q100 scores fluency
  * (bigram LM); this scores DOMAIN RELEVANCE — "how much more does
  * this document look like the curated target corpus than like the raw
  * pool?" — the published Data Selection via Importance Resampling
  * recipe (Xie et al. 2023: hashed n-gram features, log-likelihood
  * ratio of two smoothed bag-of-features models, then weighted
  * sampling without replacement on the weights). The reference repo's
  * recurring shape is again content judged against a curated slice
  * (e.g. /root/reference/src/trace/fix/check_nwb_stimulus_match.py
  * compares declared metadata against a trusted extraction); DSIR is
  * that shape generalized to distribution-level similarity.
  *
  * Semantics:
  *  - FEATURES: each whitespace token (dedup-family canonicalization:
  *    lower/trim, null → one empty token) hashes into one of
  *    [[Buckets]] classes via the cross-engine 60-bit md5 prefix —
  *    the hashing trick, so the MODEL domain is a constant [[Buckets]]
  *    rows no matter how large the corpus vocabulary grows.
  *  - MODELS: Laplace-smoothed bucket distributions over the frozen
  *    TARGET slice (doc_id % [[TargetMod]] == 0 — the curated-corpus
  *    stand-in, the same frozen-slice discipline as q100's train cut)
  *    and over the RAW pool (every document).
  *    p̂(f) = (c_f + 1) / (C + B) for each side.
  *  - WEIGHT: per document, Σ over token occurrences of
  *    log2 p̂_target(f) − log2 p̂_raw(f), in 1/1024-bit units:
  *    delta(f) = mb_raw(f) − mb_target(f) where
  *    mb_side(f) = log2mb(c_f + 1, C + B) is the side's smoothed
  *    surprisal from the SAME fixed-point kernel q100 trusts
  *    ([[graft.functions.LogExpressions]] — int64 floor steps the
  *    DuckDB oracle replays digit-for-digit). keep = weight_mb > 0:
  *    "more target-like than pool-like".
  *  - RESAMPLE (q101b): the DSIR selection step made deterministic —
  *    weighted sampling WITHOUT replacement via the exponential race
  *    (Efraimidis–Spirakis: draw u ∈ (0,1] per item, rank by
  *    −log u / w, keep the K smallest). The uniform is the
  *    hash-uniform u = (md5_60("race:" ‖ doc_id) + 1) / 2⁶⁰, so
  *    −log2 u is EXACTLY log2mb(h + 1, 2⁶⁰) and the race key
  *    race_mb = mbu · 2²⁰ DIV weight_mb is pure int64 — both engines
  *    rank the same keys digit-for-digit. Only keep-docs race
  *    (w > 0 — the race semantics require positive weights), the
  *    [[SampleK]] smallest keys win (ties broken by doc_id).
  *
  * Exactness: every arithmetic step is int64 +, ×, floor-DIV or the
  * log2mb kernel. Bounds: |delta| ≤ log2(C+B)·1024 < 64·1024, so a
  * document needs > 2⁴⁴ tokens to overflow the weight sum; race keys
  * are ≤ 61440·2²⁰ < 2³⁷.
  *
  * Scale shape: model pass = one corpus scan → map-side-combined
  * groupBy over the [[Buckets]]-sized key domain (partial aggregation
  * collapses each task's stream to ≤ B rows before the exchange — a
  * hot bucket cannot serialize a task) → constant-sized totals cross
  * join → the kernel on B-row frames. Scoring pass = one corpus scan,
  * a BROADCAST join of the B-row delta model, one map-side-combined
  * (doc_id, lang) aggregate. The resample election is a K-bounded
  * TakeOrdered (per-partition heaps, K rows to the driver) — never a
  * global sort. Nothing data-sized ever shuffles on a token or bucket
  * key; plan-pinned in PlanShapeSpec.
  */
object Dsir {

  /** hashed-feature domain size (the hashing trick: model frames are
    * exactly this many rows at ANY corpus scale). */
  val Buckets = 64

  /** target slice: doc_id % TargetMod == 0 — the frozen curated-corpus
    * stand-in (same slice discipline as [[LmScreen.TrainMod]]). */
  val TargetMod = 5

  /** resample budget: the K of the weighted without-replacement draw. */
  val SampleK = 100

  /** race-key scale: mbu · RaceScale DIV weight keeps 20 fractional
    * bits through the integer division. */
  val RaceScale = 1L << 20

  /** the md5_60 hash domain: h ∈ [0, 2⁶⁰), so (h+1)/2⁶⁰ ∈ (0, 1]. */
  val HashRange = 1L << 60

  /** feature-hash prefix (decorrelates from the sample:/mix:/ctrl:
    * hash families used elsewhere). */
  val FeatPrefix = "dsir:"

  /** race-uniform prefix. */
  val RacePrefix = "race:"

  private def tokCol: Column = split(trim(lower(coalesce(col("text"), lit("")))), " +")

  /** feature bucket of a token: md5_60("dsir:" ‖ t) mod B. md5_60 is
    * nonnegative, so pmod ≡ %, but pmod documents the intent. */
  private[operators] def bucketCol(t: Column): Column =
    pmod(Dedup.md5_60(concat(lit(FeatPrefix), t)), lit(Buckets.toLong))

  /** The per-bucket delta model: (f, delta_mb), EXACTLY [[Buckets]]
    * rows (absent buckets carry their smoothed prior). delta_mb =
    * mb_raw − mb_target ⇒ positive when the bucket is relatively more
    * frequent in the target slice. One corpus scan. */
  private[operators] def deltaModel(docs: DataFrame): DataFrame = {
    val feat = docs.select(col("doc_id"), explode(tokCol).as("t"))
      .select(col("doc_id"), bucketCol(col("t")).as("f"))
    val cnts = feat.groupBy("f").agg(
      count(lit(1)).as("r_f"),
      sum(when(pmod(col("doc_id"), lit(TargetMod.toLong)) === 0, 1L).otherwise(0L)).as("t_f"))
    // full bucket domain: a bucket no token hashed into still has a
    // smoothed probability on both sides
    val domain = docs.sparkSession.range(Buckets.toLong).select(col("id").as("f"))
    val full = domain.join(broadcast(cnts), Seq("f"), "left")
      .select(col("f"),
        coalesce(col("r_f"), lit(0L)).as("r_f"),
        coalesce(col("t_f"), lit(0L)).as("t_f"))
    val tot = full.agg(sum("r_f").as("rtot"), sum("t_f").as("ttot"))
    val withTot = full.crossJoin(broadcast(tot))
    withTot.select(col("f"),
      (graft.functions.LogExpressions.log2mb(col("r_f") + 1L, col("rtot") + Buckets.toLong) -
        graft.functions.LogExpressions.log2mb(col("t_f") + 1L, col("ttot") + Buckets.toLong))
        .as("delta_mb"))
  }

  /** unordered weight core — the scoring scan: every document has ≥ 1
    * token (the empty text canonicalizes to one empty token), so one
    * inner broadcast join + one map-side-combined aggregate surfaces
    * every document with no join-back. */
  private def weightsUnordered(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), explode(tokCol).as("t"))
      .select(col("doc_id"), col("lang"), bucketCol(col("t")).as("f"))
      .join(broadcast(deltaModel(docs)), Seq("f"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_tokens"), sum("delta_mb").as("weight_mb"))

  /** q101: per-document DSIR importance weight. Columns: doc_id, lang,
    * n_tokens, weight_mb, keep (weight_mb > 0 — more target-like than
    * pool-like). */
  def dsirWeights(docs: DataFrame): DataFrame =
    weightsUnordered(docs)
      .withColumn("keep", col("weight_mb") > 0L)
      .orderBy("doc_id")

  /** q101b: the deterministic importance-resampling draw — the
    * [[SampleK]] exponential-race winners among keep-documents
    * (weighted sampling without replacement; see object doc). Columns:
    * doc_id, lang, weight_mb, race_mb. */
  def dsirResample(docs: DataFrame): DataFrame =
    resampleFromWeights(weightsUnordered(docs))

  /** The race election over an ALREADY-COMPUTED weights frame (the
    * q101 output, or its persisted parquet / docReport-derived view):
    * a deployment computes weights once and resamples at many budgets
    * — each draw is then a pure row-local key computation + the
    * K-bounded TakeOrdered, never a re-scan of the corpus. Requires
    * doc_id, lang, weight_mb columns; spec-proven equal to
    * [[dsirResample]] composed end-to-end. */
  def resampleFromWeights(weights: DataFrame, k: Int = SampleK): DataFrame =
    weights
      .filter(col("weight_mb") > 0L)
      .withColumn("__mbu", graft.functions.LogExpressions.log2mb(
        Dedup.md5_60(concat(lit(RacePrefix), col("doc_id").cast("string"))) + 1L,
        lit(HashRange)))
      .withColumn("race_mb", expr(s"__mbu * $RaceScale DIV weight_mb"))
      .orderBy(col("race_mb").asc, col("doc_id").asc).limit(k)
      .select("doc_id", "lang", "weight_mb", "race_mb")
      .orderBy("doc_id")

  /** The collected delta model — exactly [[Buckets]] entries, a
    * broadcast-sized frozen object (the rarity/BPE/LM freeze
    * discipline): train batch-side on a released corpus, score an
    * ingest stream row-locally with
    * [[graft.streaming.DocStreams.dsirLookup]]. */
  case class DsirModel(delta: Map[Long, Long]) {
    require(delta.size == Buckets, s"model must cover all $Buckets buckets")
  }

  def dsirModel(docs: DataFrame): DsirModel =
    DsirModel(deltaModel(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)

  /** Row-local scoring against a FROZEN collected model, appended as
    * `dsir_n_tokens` / `dsir_weight_mb` / `dsir_keep` columns (all
    * other columns ride through): hash each token into its bucket,
    * look the bucket's delta up in the literal 64-entry map, sum — one
    * aggregate expression, no explode, no state, no shuffle. Shared by
    * the stream twin [[graft.streaming.DocStreams.dsirLookup]] and the
    * decode-once [[TextAnalysis.docReport]] frame. */
  def dsirScoreRowLocal(docs: DataFrame, model: DsirModel): DataFrame = {
    val entries = model.delta.toSeq.sortBy(_._1)
    docs
      .withColumn("__ds_dm", map_from_arrays(
        typedlit(entries.map(_._1)), typedlit(entries.map(_._2))))
      .withColumn("__ds_tk", expr("split(trim(lower(coalesce(text, ''))), ' +')"))
      .withColumn("dsir_n_tokens", size(col("__ds_tk")).cast("long"))
      .withColumn("dsir_weight_mb", expr(
        s"""aggregate(__ds_tk, CAST(0 AS BIGINT), (acc, t) ->
           |  acc + element_at(__ds_dm, pmod(CAST(conv(substring(
           |    md5(concat('$FeatPrefix', t)), 1, 15), 16, 10) AS BIGINT),
           |    CAST($Buckets AS BIGINT))))""".stripMargin))
      .withColumn("dsir_keep", col("dsir_weight_mb") > 0L)
      .drop("__ds_dm", "__ds_tk")
  }
}

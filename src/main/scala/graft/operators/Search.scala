package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Lexical retrieval over the corpus (SURVEY.md §2C, q86/q87) — the
  * keyword-search complement to the ANN family: tf-idf term weighting
  * and BM25-style ranked multi-term search, the tooling a curation
  * team uses to find and audit corpus slices ("show me the docs about
  * X") and the lexical half of hybrid retrieval. Reference analogue:
  * the reference delegates ranked text search to its store's ES
  * search index and only audits it
  * (/root/reference/src/search_index/search_index_discrepancy.py
  * queries the index and diffs it against the store — the q44
  * pattern); here ranked retrieval itself is a first-class engine
  * operator, so no external search service is needed.
  *
  * All scoring is EXACT integer arithmetic (scaled basis points,
  * truncating DIV) so every rank replays bit-for-bit in the DuckDB
  * oracle: idf_bp(t) = (10000·(N − df + 1)) DIV (df + 1) — the
  * rational core of the Robertson idf with the log dropped (log is
  * monotone, so per-term RANK order is identical; dropping it keeps
  * the arithmetic engine-exact instead of trusting two libm's to
  * round ln identically).
  */
object Search {

  /** per-doc term count bound for [[tfidfTerms]]. */
  val TfidfTopM = 5

  /** search result bound for [[keywordSearch]]. */
  val SearchTopK = 10

  /** terms ranked per document: m highest tf·idf_bp terms (tie → term
    * asc, binary UTF-8 in both engines).
    *
    * Scale shape: tf = one explode + map-side-combined groupBy
    * (doc_id, term); df = a second partial-combined agg over the tf
    * frame (the exchange is vocab×partitions partial rows, never the
    * corpus); the doc-count scalar is a 1-row broadcast. The df
    * re-join on term is deliberately UNHINTED: a raw-token vocabulary
    * is unbounded at corpus scale (unlike the q47/q75 sketch models,
    * which are capacity-bounded by construction), so AQE must keep
    * the choice — broadcast when the measured vocab is small,
    * skew-splittable shuffle join when it is not; forcing broadcast
    * here would be a driver-OOM landmine at 100 TB. Ranking is the
    * TopKPerKey bounded heap keyed on doc_id — never a full
    * per-partition sort — with the residual row_number window
    * touching ≤ m rows per doc. */
  def tfidfTerms(docs: DataFrame, m: Int = TfidfTopM): DataFrame = {
    val tf = docs
      .select(col("doc_id"),
        explode(Dedup.tokens(coalesce(col("text"), lit("")))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf_bp",
        expr("((10000 * (n_docs - df + 1)) DIV (df + 1)) * tf"))
    graft.plans.TopKPerKey(scored, Seq(col("doc_id")),
      Seq(col("tfidf_bp").desc, col("term").asc), m)
      .withColumn("rank", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("tfidf_bp").desc, col("term").asc)).cast(LongType))
      .select("doc_id", "rank", "term", "tf", "df", "tfidf_bp")
      .orderBy("doc_id", "rank")
  }

  /** the fixed demo query set (query_id → AND-terms); interpolated
    * into the oracle SQL so both engines score the same literals. */
  val Queries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("merge", "join"),
    2 -> Seq("window", "scan", "sort"),
    3 -> Seq("dup", "stream"))

  /** length-normalization pivot of the BM25-style score:
    * score_bp = (10000 · Σ_t idf_bp(t)·tf(t,d)) DIV (LenPivot + len). */
  val LenPivot = 1500L

  /** q87: ranked keyword search — top-k docs per query under AND
    * semantics (a doc qualifies iff it contains EVERY query term),
    * scored by length-normalized Σ idf_bp·tf.
    *
    * Scale shape: the query set is a LITERAL, so the corpus pays ONE
    * row-local scan — per distinct query term a tf column via a
    * higher-order filter over the token array (no explode of the
    * token stream, no shuffle); the df/N statistics are one scalar
    * aggregate broadcast back (1-row crossJoin, the q60/q75 pattern);
    * each doc then fans out to its (query, score) rows by inlining a
    * literal struct array (row-local, ×|queries|), non-qualifying
    * rows drop BEFORE any exchange, and the only shuffle in the plan
    * is the TopKPerKey bounded heap's final clustering on query_id —
    * map-side partials cap it at k rows per (query, input partition).
    * A window over query_id instead would move every qualifying doc
    * onto |queries| hot partitions; the heap never materializes more
    * than k rows per key anywhere. */
  def keywordSearch(docs: DataFrame,
                    queries: Seq[(Int, Seq[String])] = Queries,
                    k: Int = SearchTopK): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "every query needs at least one term")
    val terms = queries.flatMap(_._2).distinct
    val toks = docs.select(col("doc_id"),
      Dedup.tokens(coalesce(col("text"), lit(""))).as("tk"))
    val base = toks.select(
      col("doc_id") +:
        size(col("tk")).cast(LongType).as("n_tokens") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(col("tk"), x => x === lit(t))).cast(LongType).as(s"__tf$i")
        }: _*)
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      terms.indices.map(i =>
        sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i")): _*)
    val scored = base.crossJoin(broadcast(stats))
    val perQuery: Column = array(queries.map { case (qid, qterms) =>
      val idx = qterms.map(terms.indexOf)
      val raw = idx.map(i =>
        expr(s"((10000 * (n_docs - __df$i + 1)) DIV (__df$i + 1)) * __tf$i"))
        .reduce(_ + _)
      val ok = idx.map(i => col(s"__tf$i") > 0).reduce(_ && _)
      struct(lit(qid).as("query_id"), ok.as("ok"), raw.as("raw"))
    }: _*)
    val candidates = scored
      .select(col("doc_id"), col("n_tokens"), inline(perQuery))
      .filter(col("ok"))
      .select(col("query_id"), col("doc_id"),
        expr(s"(10000 * raw) DIV ($LenPivot + n_tokens)").as("score_bp"))
    graft.plans.TopKPerKey(candidates, Seq(col("query_id")),
      Seq(col("score_bp").desc, col("doc_id").asc), k)
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("score_bp").desc, col("doc_id").asc)).cast(LongType))
      .select("query_id", "rank", "doc_id", "score_bp")
      .orderBy("query_id", "rank")
  }

  /** q136: OKAPI BM25 — the standard probabilistic ranking function
    * (Robertson/Spärck Jones), completing the lexical family: q87's
    * score is linear in tf, while BM25's defining property is tf
    * SATURATION (a term's 100th occurrence adds almost nothing) plus
    * principled df-based idf and pivoted length normalization. OR
    * semantics (any query term matches — the classic), k1 = 1.2,
    * b = 0.75.
    *
    * Exact integer form, no floats anywhere:
    *   idf_mb(t)   = log2mb(2·df+1, 2·(N−df)+1)   — exactly
    *                 ⌊1024·log2((N−df+0.5)/(df+0.5))⌋ on the shared
    *                 q100 fixed-point kernel; floored at 0 when
    *                 df > N/2 (the standard non-negative clamp)
    *   tf-part     = tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)); with
    *                 k1 = 6/5, b = 3/4, avgdl = T/N this multiplies
    *                 through to 22·T·tf / (10·T·tf + 3·T + 9·dl·N) —
    *                 all integers, no avgdl rounding
    *   score_mb    = Σ_t idf_mb · 22·T·tf DIV (10·T·tf + 3·T + 9·dl·N)
    * Products are DECIMAL(38,0)-widened (the q117 discipline): at
    * 100 TB, idf_mb·22·T·tf ≈ 3.5e4·22·1e14·1e3 ≈ 8e22 overflows
    * int64 but sits far inside 38 digits.
    *
    * Scale shape: identical to q87 — ONE row-local corpus scan (tf
    * columns via HOF filters, no explode), a 1-row stats broadcast
    * (N, T, per-term df → idf), literal-struct fan-out, non-matching
    * rows drop before any exchange, TopKPerKey bounded heap. */
  def bm25Search(docs: DataFrame,
                 queries: Seq[(Int, Seq[String])] = Queries,
                 k: Int = SearchTopK): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "every query needs at least one term")
    val terms = queries.flatMap(_._2).distinct
    val toks = docs.select(col("doc_id"),
      Dedup.tokens(coalesce(col("text"), lit(""))).as("tk"))
    val base = toks.select(
      col("doc_id") +:
        size(col("tk")).cast(LongType).as("n_tokens") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(col("tk"), x => x === lit(t))).cast(LongType).as(s"__tf$i")
        }: _*)
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("t_tokens") +:
        terms.indices.map(i =>
          sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i")): _*)
    val statsIdf = stats.select(
      col("n_docs") +: col("t_tokens") +:
        terms.indices.map { i =>
          val a = col(s"__df$i") * lit(2L) + lit(1L)
          val b = (col("n_docs") - col(s"__df$i")) * lit(2L) + lit(1L)
          when(a <= b, graft.functions.LogExpressions.log2mb(a, b))
            .otherwise(0L).as(s"__idf$i")
        }: _*)
    val scored = base.crossJoin(broadcast(statsIdf))
    val perQuery: Column = array(queries.map { case (qid, qterms) =>
      val idx = qterms.map(terms.indexOf)
      val raw = idx.map(i => expr(
        s"CAST((CAST(__idf$i AS DECIMAL(38,0)) * 22 * t_tokens * __tf$i) DIV " +
          s"(CAST(10 AS DECIMAL(38,0)) * t_tokens * __tf$i + 3 * t_tokens + " +
          s"9 * n_tokens * n_docs) AS BIGINT)"))
        .reduce(_ + _)
      val ok = idx.map(i => col(s"__tf$i") > 0).reduce(_ || _)
      struct(lit(qid).as("query_id"), ok.as("ok"), raw.as("score_mb"))
    }: _*)
    val candidates = scored
      .select(col("doc_id"), inline(perQuery))
      .filter(col("ok"))
      .select(col("query_id"), col("doc_id"), col("score_mb"))
    graft.plans.TopKPerKey(candidates, Seq(col("query_id")),
      Seq(col("score_mb").desc, col("doc_id").asc), k)
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("score_mb").desc, col("doc_id").asc)).cast(LongType))
      .select("query_id", "rank", "doc_id", "score_mb")
      .orderBy("query_id", "rank")
  }

  /** Frozen query-term statistics for the percolator: per-term df and
    * the corpus size, from ONE aggregate job over the corpus (the
    * model-build step — the rarityLookup/pqEncodeStream frozen-model
    * discipline applied to lexical scoring). */
  def keywordStats(docs: DataFrame,
                   queries: Seq[(Int, Seq[String])] = Queries): (Map[String, Long], Long) = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "every query needs at least one term")
    val terms = queries.flatMap(_._2).distinct
    val toks = docs.select(Dedup.tokens(coalesce(col("text"), lit(""))).as("tk"))
    val row = toks.agg(
      count(lit(1)).as("n_docs"),
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("tk"), t), 1L).otherwise(0L)).as(s"__df$i")
      }: _*).head()
    (terms.zipWithIndex.map { case (t, i) => t -> row.getLong(i + 1) }.toMap,
      row.getLong(0))
  }

  /** The percolator scoring pass: every arriving document evaluated
    * against the STANDING query set under frozen df/N — one row per
    * qualifying (doc, query) with the exact q87 score. Entirely
    * row-local (the idf weights are literals), so it runs unchanged on
    * a stream ([[graft.streaming.DocStreams.percolateStream]]); with
    * the stats frozen from the same corpus, top-k over this output is
    * bit-identical to [[keywordSearch]] (spec-pinned). */
  def percolate(docs: DataFrame, dfByTerm: Map[String, Long], nDocs: Long,
                queries: Seq[(Int, Seq[String])] = Queries): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "every query needs at least one term")
    val terms = queries.flatMap(_._2).distinct
    require(terms.forall(dfByTerm.contains),
      s"every query term needs a frozen df entry; missing ${terms.filterNot(dfByTerm.contains)}")
    val toks = docs.select(col("doc_id"),
      Dedup.tokens(coalesce(col("text"), lit(""))).as("tk"))
    val base = toks.select(
      col("doc_id") +:
        size(col("tk")).cast(LongType).as("n_tokens") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(col("tk"), x => x === lit(t))).cast(LongType).as(s"__tf$i")
        }: _*)
    val idfOf = terms.map(t =>
      t -> (10000L * (nDocs - dfByTerm(t) + 1)) / (dfByTerm(t) + 1)).toMap
    val perQuery: Column = array(queries.map { case (qid, qterms) =>
      val raw = qterms.map(t =>
        col(s"__tf${terms.indexOf(t)}") * lit(idfOf(t))).reduce(_ + _)
      val ok = qterms.map(t => col(s"__tf${terms.indexOf(t)}") > 0).reduce(_ && _)
      struct(lit(qid).as("query_id"), ok.as("ok"), raw.as("raw"))
    }: _*)
    base.select(col("doc_id"), col("n_tokens"), inline(perQuery))
      .filter(col("ok"))
      .select(col("doc_id"), col("query_id"),
        expr(s"(10000 * raw) DIV ($LenPivot + n_tokens)").as("score_bp"))
  }

  /** The inverted posting-list index (q88's build half): one row per
    * (term, doc) with the term frequency and the doc length
    * denormalized into the posting — the impact-index layout that
    * lets a search score without a second per-doc fetch (Lucene
    * stores norms per posting-adjacent for the same reason). Build =
    * one explode + one map-side-combined (term, doc) aggregate; the
    * persisted form is bucketBy(term) (see
    * [[graft.sources.IndexCatalog.registerPostingIndex]]) so a query
    * reads only its terms' buckets. */
  def postingIndex(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      Dedup.tokens(coalesce(col("text"), lit(""))).as("tk"))
    toks
      .select(col("doc_id"), size(col("tk")).cast(LongType).as("n_tokens"),
        explode(col("tk")).as("term"))
      .groupBy("term", "doc_id", "n_tokens").agg(count(lit(1)).as("tf"))
  }

  /** the index's 1-row corpus-size metadata (frozen at build time,
    * like the ANN codebooks — the searcher must NOT derive N from the
    * pruned postings it happens to read). */
  def docCount(docs: DataFrame): DataFrame = docs.agg(count(lit(1)).as("n_docs"))

  /** q88: ranked keyword search THROUGH the posting index — the
    * amortized path to q87's scan path, exactly the q78-vs-q76b
    * relationship: the corpus is touched zero times, only the query
    * terms' postings are read (bucket-pruned off the persisted form),
    * and the output is bit-identical to [[keywordSearch]] (shared
    * oracle, spec-asserted equality).
    *
    * Scale shape: the term filter prunes the scan to the query terms'
    * buckets; df per term = a count over that sliver (each term's
    * postings ARE its df); query map, df and N broadcast onto the
    * sliver; the (query, doc) aggregate and the TopKPerKey heap
    * shuffle only matched postings — never the corpus, never the
    * vocabulary. */
  def indexedSearch(postings: DataFrame, nDocs: DataFrame,
                    queries: Seq[(Int, Seq[String])] = Queries,
                    k: Int = SearchTopK): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "every query needs at least one term")
    val spark = postings.sparkSession
    import spark.implicits._
    val qdf = queries.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "term")
    val qsize = queries.map { case (qid, ts) => (qid, ts.distinct.size.toLong) }
      .toDF("query_id", "n_terms")
    val terms = queries.flatMap(_._2).distinct
    val rel = postings.filter(col("term").isin(terms: _*))
    val dfT = rel.groupBy("term").agg(count(lit(1)).as("df"))
    val contrib = rel
      .join(broadcast(qdf), Seq("term"))
      .join(broadcast(dfT), Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("c", expr("((10000 * (n_docs - df + 1)) DIV (df + 1)) * tf"))
    val candidates = contrib
      .groupBy("query_id", "doc_id")
      .agg(sum("c").as("raw"), countDistinct("term").as("n_hit"),
        min("n_tokens").as("n_tokens"))
      .join(broadcast(qsize), Seq("query_id"))
      // AND semantics: every distinct query term present
      .filter(col("n_hit") === col("n_terms"))
      .select(col("query_id"), col("doc_id"),
        expr(s"(10000 * raw) DIV ($LenPivot + n_tokens)").as("score_bp"))
    graft.plans.TopKPerKey(candidates, Seq(col("query_id")),
      Seq(col("score_bp").desc, col("doc_id").asc), k)
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("score_bp").desc, col("doc_id").asc)).cast(LongType))
      .select("query_id", "rank", "doc_id", "score_bp")
      .orderBy("query_id", "rank")
  }

  /** the fixed demo phrase set (query_id → exact token phrase);
    * query 3 is deliberately self-adjacent — overlapping occurrences
    * each count (both engines scan every start position). */
  val Phrases: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("table", "scan"),
    2 -> Seq("merge", "join"),
    3 -> Seq("batch", "batch"))

  /** overlapping occurrence count of an exact token phrase — purely
    * row-local: every start position 1..n−p+1 tests the p tokens in
    * place (element_at is 1-based); the n ≥ p guard keeps the
    * position sequence ascending. */
  private def phraseTf(tk: Column, phrase: Seq[String]): Column = {
    val p = phrase.length
    val hits = filter(
      sequence(lit(1), size(tk) - lit(p - 1)),
      i => phrase.zipWithIndex.map { case (t, j) =>
        element_at(tk, i + lit(j)) === lit(t)
      }.reduce(_ && _))
    when(size(tk) >= lit(p), size(hits).cast(LongType)).otherwise(lit(0L))
  }

  /** q90: exact PHRASE search — the "quoted query" of a search UI and
    * the verbatim-overlap primitive of decontamination: top-k docs
    * per phrase, ranked by the q87 discipline (rational idf over the
    * phrase's doc frequency, length-normalized integer score), with
    * the phrase frequency = overlapping in-order token matches.
    *
    * Scale shape: identical to [[keywordSearch]] — the phrase set is
    * a literal, so the corpus pays ONE row-local scan (per-phrase tf
    * via position-indexed HOFs over the token array — no n-gram
    * explode), df/N one broadcast scalar row, disqualified rows drop
    * pre-exchange, only the bounded heap shuffles. */
  def phraseSearch(docs: DataFrame,
                   phrases: Seq[(Int, Seq[String])] = Phrases,
                   k: Int = SearchTopK): DataFrame = {
    require(phrases.nonEmpty && phrases.forall(_._2.nonEmpty),
      "every query needs a non-empty phrase")
    val toks = docs.select(col("doc_id"),
      Dedup.tokens(coalesce(col("text"), lit(""))).as("tk"))
    val base = toks.select(
      col("doc_id") +:
        size(col("tk")).cast(LongType).as("n_tokens") +:
        phrases.zipWithIndex.map { case ((_, p), i) =>
          phraseTf(col("tk"), p).as(s"__tf$i")
        }: _*)
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      phrases.indices.map(i =>
        sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i")): _*)
    val perQuery: Column = array(phrases.zipWithIndex.map { case ((qid, _), i) =>
      struct(lit(qid).as("query_id"), (col(s"__tf$i") > 0).as("ok"),
        expr(s"((10000 * (n_docs - __df$i + 1)) DIV (__df$i + 1)) * __tf$i").as("raw"),
        col(s"__tf$i").as("phrase_tf"))
    }: _*)
    val candidates = base.crossJoin(broadcast(stats))
      .select(col("doc_id"), col("n_tokens"), inline(perQuery))
      .filter(col("ok"))
      .select(col("query_id"), col("doc_id"), col("phrase_tf"),
        expr(s"(10000 * raw) DIV ($LenPivot + n_tokens)").as("score_bp"))
    graft.plans.TopKPerKey(candidates, Seq(col("query_id")),
      Seq(col("score_bp").desc, col("doc_id").asc), k)
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("score_bp").desc, col("doc_id").asc)).cast(LongType))
      .select("query_id", "rank", "doc_id", "phrase_tf", "score_bp")
      .orderBy("query_id", "rank")
  }

  /** RRF discount constant (Cormack et al.'s k=60, the standard). */
  val RrfK = 60L

  /** q89: HYBRID retrieval — reciprocal-rank fusion of the lexical
    * ranking ([[keywordSearch]]) and the exact vector ranking
    * ([[Similarity.knnBruteForce]] with the query ids as query
    * vectors). RRF is rank-only, so the fused score is exact integer
    * arithmetic by construction: contrib = 10000 DIV (60 + rank),
    * summed per (query, doc), ties → doc asc; n_lists records how
    * many modalities surfaced the doc (2 = agreement). This is the
    * standard fusion production hybrid search runs (lexical recall +
    * semantic recall, no score calibration needed — which is exactly
    * why RRF won: scores from different modalities never compare,
    * ranks always do).
    *
    * Scale shape: both input rankings are already k-bounded per
    * query, so fusion moves ≤ 2k rows per query — the union, the
    * (query, doc) aggregate and the final heap are all
    * queries×k-sized, never corpus-sized. */
  def hybridRrf(docs: DataFrame, embeddings: DataFrame,
                queries: Seq[(Int, Seq[String])] = Queries,
                k: Int = SearchTopK): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "every query needs at least one term")
    val qids = queries.map(_._1)
    // the vector side addresses the query-vector block by id upper
    // bound (knnBruteForce scores every vec_id < max+1) — an
    // unbounded id would silently turn the kNN into a corpus-wide
    // self-join, so fail loud instead
    require(qids.forall(q => q >= 0 && q < 1024),
      s"query ids address the query-vector block and must sit in [0, 1024); got $qids")
    val lex = keywordSearch(docs, queries, k)
      .select(col("query_id"), col("doc_id"), col("rank"))
    rrfFuse(lex, vecRanks(embeddings, qids, k), k)
  }

  /** q136b: HYBRID BM25 + VECTOR RRF — the production hybrid
    * (q89 fuses the linear-tf AND-search; deployed hybrid retrieval
    * fuses BM25 — Elasticsearch/Vespa/Weaviate's default pairing):
    * q136's exact integer Okapi ranking and the same cosine kNN,
    * fused by the SAME rank-only reciprocal-rank rule as q89 (the one
    * fusion definition, shared — rank-only inputs make the oracle
    * composition mechanical). OR semantics on the lexical side, so a
    * doc matching any term can fuse.
    *
    * Scale shape: the q136 chain + the q89 fusion unchanged — both
    * k-bounded inputs, fusion moves ≤ 2k rows per query. */
  def hybridRrfBm25(docs: DataFrame, embeddings: DataFrame,
                    queries: Seq[(Int, Seq[String])] = Queries,
                    k: Int = SearchTopK): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "every query needs at least one term")
    val qids = queries.map(_._1)
    require(qids.forall(q => q >= 0 && q < 1024),
      s"query ids address the query-vector block and must sit in [0, 1024); got $qids")
    val lex = bm25Search(docs, queries, k)
      .select(col("query_id"), col("doc_id"), col("rank"))
    rrfFuse(lex, vecRanks(embeddings, qids, k), k)
  }

  /** the vector ranking side both hybrids share. */
  private def vecRanks(embeddings: DataFrame, qids: Seq[Int], k: Int): DataFrame =
    Similarity.knnBruteForce(embeddings, nQueries = qids.max + 1, k = k)
      .filter(col("query_id").isin(qids.map(_.toLong): _*))
      .select(col("query_id").cast(IntegerType).as("query_id"),
        col("neighbor_id").as("doc_id"), col("rank"))

  /** the ONE reciprocal-rank fusion rule (q89 and q136b share it, so
    * the two hybrids cannot drift): contrib = 10000 DIV (RrfK + rank),
    * summed per (query, doc), k-bounded heap election. */
  private def rrfFuse(lex: DataFrame, vec: DataFrame, k: Int): DataFrame = {
    val fused = lex.unionByName(vec)
      .withColumn("contrib", expr(s"10000 DIV ($RrfK + rank)"))
      .groupBy("query_id", "doc_id")
      .agg(sum("contrib").as("rrf_bp"), count(lit(1)).as("n_lists"))
    graft.plans.TopKPerKey(fused, Seq(col("query_id")),
      Seq(col("rrf_bp").desc, col("doc_id").asc), k)
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("rrf_bp").desc, col("doc_id").asc)).cast(LongType))
      .select("query_id", "rank", "doc_id", "rrf_bp", "n_lists")
      .orderBy("query_id", "rank")
  }
}

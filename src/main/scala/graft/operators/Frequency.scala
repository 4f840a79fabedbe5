package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact heavy hitters via the two-pass sketch→verify plan — the
  * frequency-analysis report every large-corpus pipeline needs (which
  * sources/tokens/ids dominate the data), analogous to the reference's
  * tabulated per-type counts (reference
  * src/schemas/check_schema_validation.py summary tables) but built to
  * survive a billion-key domain.
  *
  * Pass 1: a mergeable Misra-Gries sketch ([[graft.functions.MgSketch]])
  * computes a candidate superset — map-side combined, so only
  * capacity-sized summaries cross the wire, never the distinct domain.
  * Pass 2: exact counts restricted to the broadcast candidate set, then
  * the φ-threshold filter. MG guarantees no key above N/(capacity+1)
  * is missed, so with capacity+1 ≥ 1/φ the result is EXACT — which is
  * what makes an approximate-sketch plan oracle-checkable against a
  * plain GROUP BY.
  *
  * At 100 TB: a direct groupBy over URLs/tokens shuffles billions of
  * keys to find the top handful; this plan shuffles
  * O(capacity × partitions) for pass 1 and only candidate-key rows
  * (semi-join, broadcast) for pass 2.
  */
object Frequency {

  /** keys with frequency share strictly above `phiBp` basis points,
    * with exact counts. Requires capacity+1 ≥ 10000/phiBp (the MG
    * no-miss condition). */
  def exactHeavyHitters(df: DataFrame, key: Column, phiBp: Int,
                        capacity: Int = 256): DataFrame = {
    require((capacity + 1).toLong * phiBp >= 10000L,
      s"capacity $capacity too small for phi=$phiBp bp: candidates above the threshold could be missed")
    // round-robin repartition makes the keyed projection an Exchange
    // that BOTH passes consume — Spark plans it once (ReusedExchange,
    // plan-pinned): the source is scanned and the key extracted exactly
    // once, and pass 2 re-reads only the shuffled key column (~8 B/row)
    // instead of re-running the scan + extraction. At 100 TB that
    // trades the second full pass for a key-column shuffle two orders
    // of magnitude smaller than the input — and round-robin rows can't
    // skew, whatever the key distribution.
    val keyed = df.select(key.as("k")).filter(col("k").isNotNull)
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
    // sketch AND total in one aggregate — pass 1 is a single scan; the
    // total rides along on the exploded candidate frame so pass 2 needs
    // no third read of the data
    val cands = keyed
      .agg(graft.functions.MgSketch.mg_sketch(col("k"), capacity).as("c"),
        count(lit(1)).as("n_total"))
      .select(explode(col("c")).as("k"), col("n_total"))
    keyed.join(broadcast(cands), Seq("k"))
      .groupBy("k", "n_total").agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") * 10000L > col("n_total") * phiBp)
      .select(col("k"), col("n_occurrences"),
        expr("(10000 * n_occurrences) DIV n_total").as("share_bp"))
      .orderBy("k")
  }

  /** Rows whose raw extracted `$.k` string is a strict integer literal
    * of AT MOST 18 DIGITS — a deliberately conservative gate: every
    * match fits a BIGINT with no overflow check needed, but valid
    * 19-digit BIGINTs (10¹⁸..2⁶³−1 and their negatives) are excluded
    * by design. The SAME regexp gates the DuckDB oracle, so the
    * heavy-hitter denominator (n_total) is defined identically in
    * both engines regardless of what the JSON holds (a bare cast would
    * diverge: Spark ANSI errors on non-numerics, DuckDB hard-casts;
    * a 19-digit gate would need TRY_CAST-style range checks in both).
    * Anchored with \z, not $: Java regex lets $ match before a trailing
    * newline while RE2 (DuckDB) does not — \z means end-of-text in
    * both. */
  val IntegerKeyPattern = "^-?[0-9]{1,18}\\z"

  /** q47 instance: heavy hitters of the JSON `k` property over events
    * (share > 0.5%). */
  def eventKeyHeavyHitters(events: DataFrame): DataFrame = {
    val raw = get_json_object(col("props"), "$.k")
    exactHeavyHitters(events.filter(raw.rlike(IntegerKeyPattern)),
      raw.cast(org.apache.spark.sql.types.LongType),
      phiBp = 50, capacity = 256)
  }

  /** GROUPED exact heavy hitters: the [[exactHeavyHitters]] discipline
    * with a group key — one MG sketch (and one total) per group in a
    * single map-side-combined aggregate, candidates broadcast back for
    * the exact verify. String keys ride as the engine's cross-engine
    * 60-bit md5 inside the Long-keyed sketch; the verify pass counts by
    * the ORIGINAL string, so a (vanishingly unlikely) hash collision
    * can only add a candidate, never corrupt a count — output stays
    * exact. The MG no-miss bound applies per group (each group's
    * denominator is its own total). */
  def groupedHeavyHitters(df: DataFrame, group: Column, key: Column,
                          phiBp: Int, capacity: Int = 256): DataFrame = {
    require((capacity + 1).toLong * phiBp >= 10000L,
      s"capacity $capacity too small for phi=$phiBp bp: candidates above the threshold could be missed")
    // deliberately NOT the shared-exchange trick used by
    // [[exactHeavyHitters]]: here the keyed frame is an exploded token
    // stream whose shuffle payload (grp, token, hash per row) is LARGER
    // than the source text, so materializing it to shuffle files costs
    // more than running the row-local explode+hash twice — measured at
    // bench SF and strictly worse at 100 TB (a corpus-sized shuffle
    // write vs a second CPU-only pass over the scan)
    val keyed = df.select(group.as("grp"), key.as("k"))
      .filter(col("k").isNotNull)
      .withColumn("h", Dedup.md5_60(col("k")))
    val cands = keyed.groupBy("grp")
      .agg(graft.functions.MgSketch.mg_sketch(col("h"), capacity).as("c"),
        count(lit(1)).as("n_total"))
      .select(col("grp"), explode(col("c")).as("h"), col("n_total"))
    keyed.join(broadcast(cands), Seq("grp", "h"))
      .groupBy("grp", "k", "n_total").agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") * 10000L > col("n_total") * phiBp)
      .select(col("grp"), col("k"), col("n_occurrences"),
        expr("(10000 * n_occurrences) DIV n_total").as("share_bp"))
      .orderBy("grp", "k")
  }

  /** q68 instance: the per-source TOP-TERMS report over the corpus
    * (tokens with share > 2% within their source) — the vocabulary-
    * dominance card a training-data release ships with. Tokens use the
    * ONE corpus segmentation ([[Corpus.tokenCountCol]]'s regex), so
    * term shares and token budgets agree. The explode is row-local
    * (Generate, no shuffle); only sketch summaries and candidate-key
    * rows ever cross the wire — the token DOMAIN never shuffles. */
  def sourceTopTerms(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("source"),
      explode(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)")).as("tok"))
    groupedHeavyHitters(toks, col("source"), col("tok"),
      phiBp = 200, capacity = 256)
      .withColumnRenamed("grp", "source").withColumnRenamed("k", "token")
  }
}

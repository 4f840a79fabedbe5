package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** PII screening and redaction for training corpora — the scrub pass a
  * corpus runs before anything leaves the ingest zone (reference
  * analogue: the content-hygiene side of the curation screens, e.g.
  * src/neuron_morphology/validation/quality_metric.py's per-entity
  * report discipline, applied to text privacy).
  *
  * Everything is row-local regex work over one scan — no shuffle at
  * any corpus size except the deterministic output sort. Patterns are
  * written to the common subset of Java regex (Spark) and RE2 (DuckDB
  * oracle): character classes, bounded repetition and `\b` word
  * boundaries only — no backreferences, no lookaround.
  */
object Privacy {

  /** RFC-shaped email addresses (pragmatic form, not full RFC 5322). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** dotted-quad IPv4 literals (syntactic — no octet range check, the
    * redaction posture is better-safe). */
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** long digit runs (9+ digits): account/ID/SSN-shaped numbers. No
    * upper bound — PII matches are never cast to a number, so the
    * BIGINT-fit cap of [[Frequency.IntegerKeyPattern]] does not apply
    * and a 19-digit PAN must still be caught. `\b` word boundaries mean
    * a digit run glued to letters ("acct123456789x") is NOT matched —
    * a deliberate precision choice (matching mid-token runs would
    * shred hex ids and hashes); both engines agree. */
  val IdNumPattern = "\\b[0-9]{9,}\\b"

  private def countMatches(t: Column, pattern: String): Column =
    size(regexp_extract_all(t, lit(pattern), lit(0))).cast(LongType)

  /** q66: per-document PII report + redacted-content fingerprint.
    *
    * Counts are per-pattern over the RAW text (independent detectors —
    * a digit run inside an email is intentionally counted by both if it
    * matches both patterns; the fixtures and real-world hits rarely
    * overlap). Redaction is sequential — emails first, then IPs, then
    * bare ID runs — so the replacement tokens (`<EMAIL>`, `<IP>`,
    * `<ID>`) can never be re-matched by a later pattern (they contain
    * no digits). The fingerprint of the redacted text is what a
    * downstream dedup/release step would key on; only documents with at
    * least one hit are listed (the clean corpus majority stays out of
    * the report). */
  def piiScrub(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(t, lit(EmailPattern), lit("<EMAIL>")),
        lit(Ipv4Pattern), lit("<IP>")),
      lit(IdNumPattern), lit("<ID>"))
    docs.select(
        col(idCol),
        countMatches(t, EmailPattern).as("n_email"),
        countMatches(t, Ipv4Pattern).as("n_ipv4"),
        countMatches(t, IdNumPattern).as("n_idnum"),
        md5(redacted).as("redacted_fp"))
      .withColumn("pii_total",
        col("n_email") + col("n_ipv4") + col("n_idnum"))
      .filter(col("pii_total") > 0L)
      .select(idCol, "n_email", "n_ipv4", "n_idnum", "pii_total", "redacted_fp")
      .orderBy(idCol)
  }

  /** q120: K-ANONYMITY GENERALIZATION — the structured-metadata
    * privacy audit beside q66's text scrub: each row's quasi-identifier
    * pair (nation, market segment) is released at the most specific
    * rung of a fixed generalization ladder whose population count
    * reaches k — (nation, segment) → (region, segment) → (region) →
    * suppressed. The standard global-recoding form: counts are
    * pre-generalization population counts per rung, so every row of an
    * equivalence class lands on the same rung (the relaxation vs. an
    * iterative Mondrian re-count is the stated, conventional trade).
    * A row whose quasi-identifiers are null (or reference an unknown
    * nation) fails every rung's count lookup and suppresses —
    * conservative by construction.
    *
    * Scale shape: ONE counting aggregate over the fact scan yields the
    * finest dimension-sized rollup; the coarser rungs aggregate that
    * tiny frame, and all three broadcast back onto the probe scan (the
    * dims join is a broadcast too). Two fact passes total (count +
    * probe), no fact-sized shuffle but the output sort. */
  /** the q120 release EXTENDED with the coarsening materials (the
    * region name each row would generalize to, and the sensitive band)
    * — what [[kAnonymize]] projects down and [[lDiversityApply]]
    * iterates on.
    *
    * NOTE (r19 semantics): CONSTRUCTION executes Spark jobs — the
    * dimension-sized rung card is collected and re-entered as a local
    * relation ([[Scale.localized]]), so every public caller
    * ([[kAnonymize]], [[lDiversityAudit]], [[lDiversityApply]]) pays
    * the fact counting pass when it BUILDS the frame and snapshots
    * source state at build time. */
  private def kanonRelease(customer: DataFrame, nation: DataFrame,
                           region: DataFrame, k: Int,
                           withSensitive: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val dims = nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .join(region.select(col("r_regionkey"), col("r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("__nk"), col("n_name"), col("r_name"))
    // the sensitive band only rides along for the apply path — the
    // plain release must not require the sensitive column at all
    val sens = if (withSensitive) sensitiveBand else lit(null).cast("string")
    val base = customer.select(col("c_custkey"), col("c_nationkey"),
        col("c_mktsegment"), sens.as("__sens"))
      .join(broadcast(dims), col("c_nationkey") === col("__nk"), "left")
    // ONE counting pass: the finest (nation, region, segment) rollup is
    // dimension-sized, and the coarser rungs aggregate THAT frame —
    // never the fact table again. Rung 0 keys on the resolved nation
    // NAME, so a row referencing an unknown nation has a null key,
    // fails the (null-unsafe) rung joins below and suppresses — the
    // documented conservative contract.
    // dimension-sized (≤ nation × segment rows) and consumed by all
    // three rung rollups — localized so the fact groupBy runs ONCE
    // (left lazy, each rung's broadcast re-ran the fact pass: the
    // before-plan paid 4 fact scans, this pays 2 — the rung card and
    // the final join)
    val g = Scale.localized(base.groupBy("n_name", "r_name", "c_mktsegment")
      .agg(count(lit(1)).as("__c")))
    val l0 = g.groupBy("n_name", "c_mktsegment").agg(sum("__c").as("n0"))
    val l1 = g.groupBy("r_name", "c_mktsegment").agg(sum("__c").as("n1"))
    val l2 = g.groupBy("r_name").agg(sum("__c").as("n2"))
    base.join(broadcast(l0), Seq("n_name", "c_mktsegment"), "left")
      .join(broadcast(l1), Seq("r_name", "c_mktsegment"), "left")
      .join(broadcast(l2), Seq("r_name"), "left")
      .withColumn("anon_level", expr(
        s"CAST(CASE WHEN n0 >= $k THEN 0 WHEN n1 >= $k THEN 1 WHEN n2 >= $k THEN 2 ELSE 3 END AS BIGINT)"))
      .withColumn("geo", expr(
        "CASE WHEN anon_level = 0 THEN n_name WHEN anon_level IN (1, 2) THEN r_name ELSE '*' END"))
      .withColumn("segment", expr(
        "CASE WHEN anon_level <= 1 THEN c_mktsegment ELSE '*' END"))
      .select("c_custkey", "anon_level", "geo", "segment", "r_name", "__sens")
  }

  def kAnonymize(customer: DataFrame, nation: DataFrame, region: DataFrame,
                 k: Int = 5): DataFrame =
    kanonRelease(customer, nation, region, k)
      .select("c_custkey", "anon_level", "geo", "segment")
      .orderBy("c_custkey")

  /** q120c: L-DIVERSITY APPLY — the coarsen/suppress rewrite for the
    * classes q120b flags (the diagnose→apply discipline — q46→q128,
    * q113→q114, q133→q133b — applied to the privacy family): starting
    * from the q120 release, iterate AUDIT → COARSEN up to the ladder
    * depth: every non-suppressed equivalence class (anon_level, geo,
    * segment) is judged on its ACTUAL members — n ≥ k AND ≥ l distinct
    * sensitive bands — and a failing class's rows all step one rung
    * (nation→region, then segment→'*', then full suppression). The
    * fixpoint argument is monotone: rows only ever ENTER coarser
    * classes, so a class that passes can only gain members (n and
    * distinct counts never fall) and three rounds reach the ladder
    * floor — the released table RE-AUDITS CLEAN at the same k and l by
    * construction (suppressed rows carry no quasi-identifiers and are
    * exempt, the standard posture). Judging actual members also
    * tightens q120's stated global-recoding relaxation (pre-
    * generalization rung counts), which could release a class whose
    * realized membership dipped under k.
    *
    * Scale shape (r19 optimization — guide §2.3/§3.3): the audit→
    * coarsen loop runs on the CLASS CARD, never on the fact rows. Every
    * row of an equivalence class moves together (the coarsening CASE
    * reads only class-level attributes — lvl, geo, segment, and r_name,
    * which is functionally determined by (lvl, geo) for lvl < 3 since a
    * nation has one region and coarser rungs carry the region itself),
    * so one map-side-combined rollup to (class × sensitive-band) rows
    * with member counts carries EXACTLY the information each round's
    * judge needs: n = Σ counts, distinct bands = distinct __sens rows.
    * The three rounds then iterate that dimension-sized frame alone,
    * and the per-row apply collapses to ONE broadcast join of the
    * (initial class → final class) map back onto the release. The
    * previous form re-derived the fact pipeline inside every round's
    * self-join — the unexecuted plan held 158 Exchanges / 190
    * BroadcastHashJoins (8 copies of the fact subtree, plan-doubling
    * per round; plans/r19/q120c_ldiversity_apply_before.txt); this
    * form is 2 row-local fact passes (card + apply) plus driver work on
    * the collected dimension-sized card, regardless of ladder depth —
    * at 100 TB the difference between 8 fact scans and 2. */
  def lDiversityApply(customer: DataFrame, nation: DataFrame,
                      region: DataFrame, k: Int = 5, l: Int = 3): DataFrame = {
    require(l >= 1, s"l must be >= 1, got $l")
    val rel = kanonRelease(customer, nation, region, k, withSensitive = true)
      .select(col("c_custkey"), col("anon_level").as("lvl"),
        col("geo"), col("segment"), col("r_name"), col("__sens"))
    // ONE fact rollup: (class, r_name, sensitive band) → member count.
    // Dimension-sized by construction (classes are bounded by the
    // nation/region × segment dimensions × the 4-band alphabet,
    // independent of fact row count), so it collects — the repo's
    // model-sized-state rule: sketches/models to the driver, never
    // population-sized frames. Iterating the card as DataFrames would
    // re-embed the fact subtree in every round's self-join (the plan
    // doubling this rewrite removes).
    val cardRows = rel.groupBy("lvl", "geo", "segment", "r_name", "__sens")
      .agg(count(lit(1)).as("__n"))
      .collect()
    // the ladder on the card, driver-side exact integer/string ops:
    // (initial class, r_name, band, n) with the CURRENT class iterated.
    final case class Cls(lvl0: Long, geo0: String, seg0: String,
                         rName: String, sens: String, n: Long,
                         lvl: Long, geo: String, seg: String)
    var cur = cardRows.toSeq.map { r =>
      val (lv, g, sg) = (r.getLong(0), r.getString(1), r.getString(2))
      Cls(lv, g, sg, r.getString(3), r.getString(4), r.getLong(5), lv, g, sg)
    }
    for (_ <- 1 to 3) {
      // judge on ACTUAL members, replayed on the card: Σn = class size;
      // card rows are distinct per (class, band), so the band-diversity
      // count is the number of distinct sens values among a class's rows
      val failing = cur.filter(_.lvl < 3)
        .groupBy(c => (c.lvl, c.geo, c.seg))
        .collect { case (key, rs)
          if rs.iterator.map(_.n).sum < k ||
            rs.iterator.map(_.sens).toSet.size < l => key }
        .toSet
      cur = cur.map { c =>
        if (c.lvl < 3 && failing((c.lvl, c.geo, c.seg))) c.copy(
          lvl = c.lvl + 1L,
          geo = if (c.lvl == 0L) c.rName // nation → region
                else if (c.lvl == 1L) c.geo // region stays
                else "*",                 // suppress
          seg = if (c.lvl == 0L) c.seg else "*")
        else c
      }
    }
    // initial class → final class: a class's band rows collapse (their
    // trajectories are identical by construction)
    val finalMap = cur.map(c => (c.lvl0, c.geo0, c.seg0, c.lvl, c.geo, c.seg)).distinct
    val session = customer.sparkSession
    import session.implicits._
    val mapDf = finalMap.toDF("__lvl0", "__geo0", "__seg0",
      "__flvl", "__fgeo", "__fseg")
    rel.join(broadcast(mapDf),
        col("lvl") === col("__lvl0") && col("geo") === col("__geo0") &&
          col("segment") === col("__seg0"))
      .select(col("c_custkey"), col("__flvl").as("anon_level"),
        col("__fgeo").as("geo"), col("__fseg").as("segment"))
      .orderBy("c_custkey")
  }

  /** the q120b sensitive attribute: the account balance discretized
    * into four fixed bands (comparisons on the raw double are
    * identical in both engines; the band label, not the balance, is
    * what the release would carry). Shared with the oracle SQL. */
  private[graft] def sensitiveBand: org.apache.spark.sql.Column = expr(
    "CASE WHEN c_acctbal < 0 THEN 'debt' WHEN c_acctbal < 3000 THEN 'low' " +
      "WHEN c_acctbal < 7000 THEN 'mid' ELSE 'high' END")

  /** q120b: L-DIVERSITY AUDIT — the standard companion check to
    * q120's k-anonymity (Machanavajjhala et al.: a k-anonymous class
    * whose members all share ONE sensitive value still discloses it —
    * group size protects against re-identification, not attribute
    * disclosure): per RELEASED equivalence class (the q120 ladder's
    * (anon_level, geo, segment)), the member count, the number of
    * distinct sensitive-band values and the ≥ l verdict. Classes that
    * fail are where the release must coarsen further or suppress —
    * the card a privacy review signs off next to the q120 manifest.
    *
    * Scale shape: the q120 plan unchanged + one fact-keyed equi-join
    * (AQE-splittable) to pick up the band, then ONE map-side-combined
    * rollup to a dimension-sized class card; the distinct count's
    * inner key domain is the 4-band alphabet, so the expanded
    * aggregate stays bounded. */
  def lDiversityAudit(customer: DataFrame, nation: DataFrame,
                      region: DataFrame, k: Int = 5, l: Int = 3): DataFrame = {
    require(l >= 1, s"l must be >= 1, got $l")
    kAnonymize(customer, nation, region, k)
      .join(customer.select(col("c_custkey"), sensitiveBand.as("__sens")),
        Seq("c_custkey"))
      .groupBy("anon_level", "geo", "segment")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("__sens")).as("n_sensitive_distinct"))
      .withColumn("is_l_diverse", col("n_sensitive_distinct") >= l)
      .orderBy("anon_level", "geo", "segment")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Decimals._

/** Curation / registration operators — quality reports, feature
  * annotations, metadata mapping, annotation upsert, pre-registration
  * dedup, declared-vs-computed consistency, schema drift.
  *
  * These re-express the reference's per-resource Python loops as
  * grouped aggregations and joins (reference
  * src/neuron_morphology/validation/quality_metric.py:83 batch reports,
  * feature_annotations/morph_metrics_neurom.py, morphology_registration
  * mapping + name-dedup, validation/create_update_curation_annotation,
  * validation/region_comparison.py, schemas/check_changed_schemas.py).
  */
object Curation {

  /** q22: per-entity quality metric vector + the same columns the batch
    * TSV report carries (one row per order ≙ one row per morphology). */
  def qualityMetrics(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_orderkey").as("entity_id"))
      .agg(
        count(lit(1)).as("n_lineitems"),
        sum2(col("l_quantity")).as("sum_qty"),
        count(when(col("l_returnflag") === "R", 1)).as("n_returned"),
        max(col("l_tax")).as("max_tax"),
        min(col("l_shipdate")).cast(DateType).as("first_ship"),
        max(col("l_shipdate")).cast(DateType).as("last_ship"))
      .orderBy("entity_id")

  /** q23: derived numeric feature annotations per part, kept for parts
    * with no usage too (left join), like annotations registered for
    * every morphology whether or not features were extractable. */
  def featureAnnotations(part: DataFrame, lineitem: DataFrame): DataFrame = {
    // r19 wire adjudication: Spark 4.1 already plans this
    // countDistinct-beside-plain-aggs as the two-level (partkey,
    // suppkey) partial aggregation (NO Expand — verified in
    // plans/r19/q23_feature_annotations_before.txt), so the 21.5 MB
    // exchange is the distinct pair domain itself — irreducible under
    // exact COUNT(DISTINCT) semantics (a hand-written two-level rollup
    // reproduced the same plan shape and the same metered bytes). The
    // at-scale answer is the promoted q23b KMV entry (0.19× wire).
    val usage = lineitem
      .groupBy(col("l_partkey").as("pk"))
      .agg(
        count(lit(1)).as("n_uses"),
        sum2(col("l_quantity")).as("total_qty"),
        sumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
        countDistinct(col("l_suppkey")).as("n_suppliers"))
    part.select("p_partkey", "p_brand")
      .join(usage, col("p_partkey") === col("pk"), "left")
      .select(
        col("p_partkey"), col("p_brand"),
        coalesce(col("n_uses"), lit(0L)).as("n_uses"),
        col("total_qty"), col("revenue"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
      .orderBy("p_partkey")
  }

  /** q23b (r18 verdict item 4 — q23's at-scale alternative, promoted
    * to its own oracle-checked inventory entry): priced by
    * [[graft.BenchKmv]], value-checked against the EXACT countDistinct
    * SQL, which is legitimate because below k distinct suppliers per
    * part (every part at the verify SFs — KmvSketchSpec pins it) the
    * sketch holds every distinct hash and the estimator returns the
    * sketch size, i.e. the exact count. Exact countDistinct plans as a
    * distinct
    * expand — every distinct (partkey, suppkey) pair crosses the wire
    * once, which makes q23 the suite's heaviest shipper (21.5 MB,
    * BENCH_full_r17 `queries_shuffle_mb`) and is DATA-SIZED at 100 TB.
    * The swap replaces it with the q17 KMV sketch aggregate: per-key
    * wire payload capped at min(k, distinct) 8-byte hash minima per
    * mapper partial, independent of the true cardinality — AND it
    * removes the expand itself, so the plain aggregates stop being
    * shipped twice. Measured (KMV_r18): the wire collapses even at
    * q23's low per-key cardinality, where the sketch holds every hash
    * and the estimate is also EXACT (error 0); the accuracy trade only
    * appears on grains whose per-key distincts exceed k — the 100 TB
    * shape, priced by BenchKmv's high-cardinality cell on the same
    * tables. Estimator = the q17 (k-1)·2^60/kth form over a 60-bit
    * uniform hash (shiftrightunsigned(xxhash64)). */
  def featureAnnotationsKmv(part: DataFrame, lineitem: DataFrame,
                            k: Int = 64): DataFrame = {
    val h = shiftrightunsigned(xxhash64(col("l_suppkey")), 4)
    val usage = lineitem
      .groupBy(col("l_partkey").as("pk"))
      .agg(
        count(lit(1)).as("n_uses"),
        sum2(col("l_quantity")).as("total_qty"),
        sumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
        graft.functions.KmvSketch.kmv_sketch(h, k).as("sk"))
    val sketchSize = size(col("sk"))
    val kth = element_at(col("sk"), sketchSize)
    part.select("p_partkey", "p_brand")
      .join(usage, col("p_partkey") === col("pk"), "left")
      .select(
        col("p_partkey"), col("p_brand"),
        coalesce(col("n_uses"), lit(0L)).as("n_uses"),
        col("total_qty"), col("revenue"),
        coalesce(
          when(sketchSize < k, sketchSize.cast(LongType))
            .otherwise(floor(lit((k - 1).toDouble * math.pow(2, 60)) /
              kth.cast(org.apache.spark.sql.types.DoubleType))),
          lit(0L)).as("n_suppliers_est"))
      .orderBy("p_partkey")
  }

  /** q140: FEATURE-ANNOTATION PUSH — the reference's main
    * feature-annotation loop (/root/reference/src/neuron_morphology/
    * feature_annotations/create_update_annotations.py:85-145
    * `update_create_one`): the freshly COMPUTED per-compartment
    * annotations of each morphology are diffed against its EXISTING
    * annotation resources BY COMPARTMENT — a computed compartment with
    * no existing annotation becomes a CREATE (a new resource, :121-133),
    * one with an existing annotation becomes an UPDATE that replaces
    * `hasBody` ONLY and keeps the resource identity (:135-141 —
    * "Update hasBody of annotations only"); BOTH lists are stamped
    * with the morphology's target metadata / generation / contribution
    * (`add_additional_info`, :71-82). Existing-only compartments are
    * UNTOUCHED — the reference iterates `computed.keys()` and never
    * deletes — and that asymmetry is preserved here (no delete kind).
    *
    * Fixture mapping: morphologies = part; the computed annotations are
    * q23-style usage metrics per (part, compartment) where the
    * compartment is the closed-form l_linenumber class; the existing
    * store is the closed-form (p_partkey + len(compartment)) % 3 subset
    * carrying its own revision. One row per COMPUTED (entity,
    * compartment): action ∈ create | update, the new body
    * (n_uses/total_qty), prev_rev kept on updates (the preserved
    * identity), null on creates, and the stamped morphology metadata.
    *
    * Scale shape: computed collapses through ONE map-side-combined
    * groupBy on the (partkey, compartment) composite key; the existing
    * store and the metadata stamp join on their own keys
    * (AQE-splittable equi-joins — at 100 TB the annotation store is
    * data-sized, so no broadcast is assumed); the action split is
    * row-local CASE logic. No window, no data-sized broadcast. */
  def annotationPush(part: DataFrame, lineitem: DataFrame): DataFrame =
    annotationDiff(computedCompartmentAnnotations(lineitem),
      existingAnnotations(part), part)
      .orderBy("entity_id", "compartment")

  /** q140's computed side: the freshly COMPUTED per-(entity,
    * compartment) annotation bodies — one map-side-combined groupBy
    * on the composite key. Public because the streaming door feeds
    * these rows through [[graft.streaming.EventStreams
    * .annotationPushSink]] as they arrive. */
  def computedCompartmentAnnotations(lineitem: DataFrame): DataFrame = {
    val compartment = expr(
      """CASE CAST(l_linenumber % 4 AS INT)
           WHEN 0 THEN 'axon' WHEN 1 THEN 'soma'
           WHEN 2 THEN 'dendrite' ELSE 'neurite' END""")
    lineitem
      .select(col("l_partkey"), compartment.as("compartment"), col("l_quantity"))
      .groupBy(col("l_partkey").as("entity_id"), col("compartment"))
      .agg(count(lit(1)).as("n_uses"), sum2(col("l_quantity")).as("total_qty"))
  }

  /** q140's existing-store closed form: (ex_id, ex_comp, prev_rev). */
  def existingAnnotations(part: DataFrame): DataFrame = part
    .select(col("p_partkey").as("ex_id"))
    .withColumn("ex_comp",
      explode(array(lit("axon"), lit("soma"), lit("dendrite"), lit("neurite"))))
    .filter((col("ex_id") + length(col("ex_comp"))) % 3 === 0)
    .withColumn("prev_rev", (col("ex_id") % 5 + 1).cast(LongType))

  /** the q140 DIFF itself, against an arbitrary existing frame of
    * shape (ex_id, ex_comp, prev_rev) — ONE definition shared by the
    * batch operator and the streaming door, so the two cannot drift:
    * computed-with-no-existing → create, computed-with-existing →
    * update keeping prev_rev, existing-only untouched (the reference
    * iterates computed.keys() and never deletes); both stamped with
    * the entity's metadata. Unsorted — callers order. */
  def annotationDiff(computed: DataFrame, existing: DataFrame,
                     part: DataFrame): DataFrame =
    computed
      .join(existing,
        col("entity_id") === col("ex_id") && col("compartment") === col("ex_comp"),
        "left")
      .join(part.select(col("p_partkey"), col("p_brand")),
        col("entity_id") === col("p_partkey"))
      .select(
        col("entity_id"), col("compartment"),
        when(col("prev_rev").isNotNull, lit("update"))
          .otherwise(lit("create")).as("action"),
        col("n_uses"), col("total_qty"), col("prev_rev"),
        col("p_brand").as("brand"))

  /** the annotation-store MERGE KEY — the resource identity every
    * annotation store in the repo keys on (`<entity>:<compartment>`).
    * ONE definition (review finding r16: the construction existed in
    * three places; a drifted copy — different separator, different
    * cast — would make the streaming door's merges miss the seeded
    * store's keys and silently duplicate every push). Shared by
    * [[annotationStoreSeed]], the q141 pipeline store and the
    * streaming door. */
  def annKey(entity: Column, compartment: Column): Column =
    concat(entity.cast(org.apache.spark.sql.types.StringType),
      lit(":"), compartment)

  /** a persistable annotation-store seed matching [[existingAnnotations]]:
    * the state the streaming door's MERGE pushes into (stale zero
    * bodies at the closed-form revisions — the q141 seeding shape on
    * the part side). */
  def annotationStoreSeed(part: DataFrame): DataFrame =
    existingAnnotations(part).select(
      annKey(col("ex_id"), col("ex_comp")).as("ann_id"),
      col("ex_id").as("entity_id"), col("ex_comp").as("compartment"),
      lit(0L).as("n_uses"), lit(0L).as("total_qty"),
      col("prev_rev").as("rev"))

  /** Declarative source→target metadata mapping: each target field is a
    * named Column expression (the reference's dict-reshaping per
    * resource before registration). */
  def mapFields(src: DataFrame, fields: Seq[(String, Column)]): DataFrame =
    src.select(fields.map { case (n, c) => c.as(n) }: _*)

  /** q24: the concrete mapping used in the inventory — customers to a
    * registration-shaped frame. */
  def metadataMapping(customer: DataFrame): DataFrame =
    mapFields(customer, Seq(
      "resource_id" -> concat(lit("customer:"), col("c_custkey")),
      "name" -> upper(col("c_name")),
      "segment" -> lower(col("c_mktsegment")),
      "balance_cents" -> round(col("c_acctbal") * 100).cast(LongType),
      "status" -> when(col("c_acctbal") < 0, "overdrawn").otherwise("ok")
    )).orderBy("resource_id")

  /** q25: annotation upsert — new annotations (derived from linked
    * evidence) override existing ones, rows with neither keep null.
    * The evidence side is pre-aggregated to distinct keys before the
    * join, so the shuffle carries one row per annotated entity. */
  def curationUpsert(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val newAnn = lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("ann_key")).distinct()
      .withColumn("new_ann", lit("HasReturns"))
    orders
      .select(col("o_orderkey"),
        when(col("o_orderstatus") === "F", "Legacy").as("existing_ann"))
      .join(newAnn, col("o_orderkey") === col("ann_key"), "left")
      .select(col("o_orderkey"),
        coalesce(col("new_ann"), col("existing_ann")).as("curation_status"))
      .orderBy("o_orderkey")
  }

  /** q26: pre-registration dedup — flag rows whose normalized name
    * collides within the incoming batch (q83 groupBy+join count via
    * [[Scale.keyAggJoin]] — a batch is bounded in practice, but the
    * one-task-per-hot-name window shape is banned repo-wide) or with
    * the existing store (broadcast semi-style left join), like the
    * registration pipeline's name-collision screen. */
  def registrationDedup(incoming: DataFrame, existing: DataFrame): DataFrame = {
    val ex = existing.select(lower(col("p_name")).as("ex_name")).distinct()
    Scale.keyAggJoin(
        incoming.withColumn("__name", lower(col("p_name"))),
        Seq("__name"), Seq(count(lit(1)).as("n_same_name")))
      .join(broadcast(ex), col("__name") === col("ex_name"), "left")
      .select(
        col("p_partkey"), col("p_name"),
        (col("n_same_name") > 1).as("dup_in_batch"),
        col("ex_name").isNotNull.as("exists_in_store"))
      .orderBy("p_partkey")
  }

  /** q67: FUZZY name-collision screen — the edit-distance sibling of
    * [[registrationDedup]] (the reference's registration check catches
    * exact name collisions; real curation also wants "Smith-2024-axon"
    * vs "Smith-2024-axn"). Classic blocked record linkage:
    *
    *  1. the name UNIVERSE is deduplicated first (exact `distinct` —
    *     at corpus scale the distinct-name frame is orders of magnitude
    *     smaller than the row count, and it is the only thing that ever
    *     self-joins);
    *  2. candidate pairs come from an EQUALITY join on a blocking key
    *     (never an all-pairs product), so the quadratic cost is bounded
    *     by the largest block;
    *  3. `levenshtein` runs only on in-block pairs.
    *
    * Blocking keys trade recall for scale by construction (a typo
    * inside the key escapes the block — standard practice is a second
    * pass with a different key, which is just another call with a
    * different `blockKey`). `blockKey` expressions are evaluated over a
    * one-column frame named `name`.
    *
    * SCALE GUARD: block sizes grow with the distinct-name universe and
    * in-block work is quadratic, so the total levenshtein cost is
    * bounded ONLY if the largest block is. The plan therefore measures
    * every block (one map-side-combined count over the distinct-name
    * frame, broadcast back) and FAILS FAST — `assert_true` inside the
    * self-join input — the moment any block exceeds `maxBlock`, instead
    * of silently running a maxBlock²-breaking product. With the guard,
    * worst-case comparisons are ≤ maxBlock²/2 per block and the join
    * stays an equality join at any corpus size. Callers hitting the
    * guard should pick a finer `blockKey` (or consciously raise the
    * cap), not remove it. */
  def fuzzyNameMatches(df: DataFrame, nameCol: String, maxDist: Int,
                       blockKey: Seq[Column], maxBlock: Int = 10000): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(maxBlock >= 1, s"maxBlock must be >= 1, got $maxBlock")
    val names = df.select(col(nameCol).as("name"))
      .filter(col("name").isNotNull).distinct()
    val blocked = blockKey.zipWithIndex.foldLeft(names) {
      case (acc, (k, i)) => acc.withColumn(s"__bk$i", k)
    }
    val bks = blockKey.indices.map(i => s"__bk$i")
    // dimension-sized (one row per block); the filter below cannot be
    // pruned away — assert_true throws on the first oversized block
    val sizes = blocked.groupBy(bks.map(col): _*)
      .agg(count(lit(1)).as("__bn"))
    val guarded = blocked.join(broadcast(sizes), bks)
      .filter(assert_true(col("__bn") <= maxBlock,
        concat(lit(s"fuzzyNameMatches: a block exceeds maxBlock=$maxBlock ("),
          col("__bn"),
          lit(" names share one blocking key); in-block cost is " +
            "quadratic — use a finer blockKey or raise maxBlock"))).isNull)
    // guard one side only: every block appears on side a, so the assert
    // still covers all blocks while the sizes aggregate is planned once
    val a = guarded.select(col("name").as("name_a") +: bks.map(col): _*)
    val b = blocked.select(col("name").as("name_b") +: bks.map(col): _*)
    a.join(b, bks)
      .filter(col("name_a") < col("name_b"))
      .withColumn("edit_dist",
        levenshtein(col("name_a"), col("name_b")).cast(LongType))
      .filter(col("edit_dist") <= maxDist)
      .select("name_a", "name_b", "edit_dist")
      .orderBy("name_a", "name_b")
  }

  /** q27: declared-vs-computed consistency (region_comparison.py:
    * declared brain region vs atlas placement): declared order status
    * vs a flag recomputed from the raw lineitems. */
  def declaredVsComputed(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val computed = lineitem
      .groupBy(col("l_orderkey").as("ck"))
      .agg(max(col("l_shipdate")).as("last_ship"))
    orders
      .join(computed, col("o_orderkey") === col("ck"), "left")
      .select(col("o_orderstatus"),
        (col("last_ship") <= lit("1998-01-01")).as("all_shipped_early"))
      .groupBy("o_orderstatus", "all_shipped_early")
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus", "all_shipped_early")
  }

  /** q28: schema drift — observed values of constrained fields vs the
    * expected vocabulary, per field (check_changed_schemas.py: which
    * resources now carry an unexpected constraint). */
  def schemaDrift(orders: DataFrame): DataFrame = {
    val pr = orders.groupBy(col("o_orderpriority").as("value"))
      .agg(count(lit(1)).as("n"))
      .select(lit("o_orderpriority").as("column_name"), col("value"),
        col("value").isin("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
          .as("is_expected"), col("n"))
    val st = orders.groupBy(col("o_orderstatus").as("value"))
      .agg(count(lit(1)).as("n"))
      .select(lit("o_orderstatus").as("column_name"), col("value"),
        col("value").isin("O", "F", "P").as("is_expected"), col("n"))
    pr.unionByName(st).orderBy("column_name", "value")
  }

  /** Declarative batch fix with a changed-rows report — the reference's
    * fix_* scripts (reference src/trace/fix/fix_content_url.py,
    * fix_encoding_format.py) loop per resource, rewrite one field and
    * push back; the Spark form applies every rule in one scan and
    * reports (id, field, old, new) ONLY for rows a rule actually
    * changed (null-safe compare), which is both the audit trail and
    * the update batch a MergeWriter push-back would take. One scan per
    * rule, no shuffle but the output sort. */
  def batchFix(df: DataFrame, idCol: String, fixes: Seq[(String, Column)]): DataFrame =
    fixes.map { case (field, fixed) =>
      df.select(col(idCol).as("id"), lit(field).as("field"),
        col(field).cast(org.apache.spark.sql.types.StringType).as("old_value"),
        fixed.cast(org.apache.spark.sql.types.StringType).as("new_value"))
        .filter(!(col("new_value") <=> col("old_value")))
    }.reduce(_.unionByName(_)).orderBy("id", "field")

  /** q56 instance: normalize the unspecified priority label and fold
    * pending status into open — the enum-normalization shape of
    * fix_encoding_format.py. */
  def orderFixes(orders: DataFrame): DataFrame =
    batchFix(orders, "o_orderkey", Seq(
      "o_orderpriority" ->
        regexp_replace(col("o_orderpriority"), "^4-NOT SPECIFIED$", "4-UNSPECIFIED"),
      "o_orderstatus" ->
        regexp_replace(col("o_orderstatus"), "^P$", "O")))

  /** deterministic stand-in "next release" of a documents corpus —
    * removals, text revisions, metadata changes and additions by pure
    * id rules, mirrored literally in the q64 oracle SQL so both engines
    * diff the identical pair of releases. */
  def releaseView(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 31 =!= 0)
      .withColumn("text", when(col("doc_id") % 17 === 0,
        concat(col("text"), lit(" revised"))).otherwise(col("text")))
      .withColumn("lang", when(col("doc_id") % 13 === 0, lit("xx"))
        .otherwise(col("lang")))
      .unionByName(docs.filter(col("doc_id") % 41 === 0)
        // clone-id offset far above any real doc_id range so "added"
        // rows can never collide with an existing id at larger SFs
        .withColumn("doc_id", col("doc_id") + lit(1000000000000L)))

  /** q64: CORPUS RELEASE DIFF — the dataset-versioning audit between
    * two corpus releases: per document, added / removed / text_changed
    * (content fingerprint differs — q40's normalization, so whitespace
    * noise is not a change) / meta_changed (lang or source moved).
    * The reference's update loops imply exactly this question ("what
    * did this batch of pushes change?", reference
    * src/neuron_morphology/feature_annotations/check_annotation_success_update.py);
    * here it is one declarative pass. Plan: both releases pruned to
    * (id, fingerprint, lang, source), one co-partitioned full-outer
    * join on doc_id — linear at any corpus size; all comparisons
    * null-safe so absent metadata diffs like any other value. */
  def corpusDiff(a: DataFrame, b: DataFrame): DataFrame = {
    def prep(df: DataFrame, suf: String) = df.select(col("doc_id"),
      lit(1).as(s"in_$suf"),
      TextAnalysis.fingerprintCol(col("text")).as(s"fp_$suf"),
      col("lang").as(s"lang_$suf"), col("source").as(s"src_$suf"))
    prep(a, "a").join(prep(b, "b"), Seq("doc_id"), "full_outer")
      .withColumn("change_type",
        when(col("in_a").isNull, lit("added"))
          .when(col("in_b").isNull, lit("removed"))
          .when(!(col("fp_a") <=> col("fp_b")), lit("text_changed"))
          .when(!(col("lang_a") <=> col("lang_b"))
            || !(col("src_a") <=> col("src_b")), lit("meta_changed"))
          .otherwise(lit("unchanged")))
      .filter(col("change_type") =!= "unchanged")
      .select(col("doc_id"), col("change_type"),
        coalesce(col("lang_b"), col("lang_a")).as("lang"))
      .orderBy("doc_id")
  }
}

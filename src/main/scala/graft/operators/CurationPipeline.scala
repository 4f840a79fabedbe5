package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** q141: the reference's END-TO-END daily curation workflow composed as
  * ONE oracle-checked pipeline — the chain a reference user actually
  * runs (reference src/neuron_morphology/validation/validator.py:1-532
  * structural checks → validation/quality_metric.py:83-127 metric
  * batch → feature_annotations/create_update_annotations.py:85-145
  * computed-vs-existing diff → the forge.update MERGE push), re-staged
  * over the engine's proven parts so nothing is defined twice:
  *
  *   1. DECODE ONCE: [[NeuriteAtlas.morphReport]] is built and
  *      PERSISTED — every later stage reads the narrow nested frame;
  *      no payload byte is ever re-read (the mediaReport discipline
  *      applied to the reference side — r15 verdict item 1).
  *   2. VALIDATE ([[Validation.Rule]] objects — the q96/q21b
  *      machinery, THE SAME null semantics `violation IS NOT TRUE`):
  *      [[MorphRules]] are the reference validator's structural
  *      screens as zero-tolerance ranges over the report's q79 metric
  *      columns. The radical-diameter screen is carried as a metric
  *      but does NOT gate the push — the reference tiers it as a
  *      warning (custom_validation.py returns check reports; only
  *      structural errors block registration), and a fixture where
  *      radius spikes land on every 13th node would otherwise reject
  *      nearly every entity.
  *   3. ANNOTATION DIFF (the q140 shape): computed per-(morphology,
  *      neurite type) feature annotations — the report's q98b
  *      `features` rows — are diffed against the EXISTING store by
  *      compartment: no existing row → `create` (rev 1), existing →
  *      `update` (rev prev+1); existing-only compartments are
  *      UNTOUCHED (the reference iterates computed.keys() and never
  *      deletes). Only morphologies passing step 2 are pushed.
  *   4. MERGE PUSH: the actions go through the REAL
  *      [[MergeWriter.applyTo]] copy-on-write writer into the seeded
  *      store, and q141's output is the POST-MERGE STORE STATE read
  *      back from disk — so the driver's oracle checks the composed
  *      decode→validate→diff→writer chain end-to-end, not a merge
  *      expression.
  *
  * Scale shape: ONE payload decode (the report build's skew-evening
  * repartition is the only blob-sized exchange — plan-pinned in
  * CurationPipelineSpec); everything downstream is narrow rows:
  * a row-local validate, one features explode, two AQE-splittable
  * equi-joins (existing store, then the merge's full-outer), zero
  * windows, zero data-sized broadcasts. At 100 TB the store merge is
  * the partitioned-writer path (q43b) — the flat swap here keeps the
  * inventory entry self-contained.
  */
object CurationPipeline {

  /** the validator's structural screens over the report's q79 metric
    * columns — SHARED [[Validation.Rule]] objects (q96 discipline), so
    * the composed gate cannot drift from the standalone rule
    * semantics. Zero-tolerance ranges: any single-child section,
    * multifurcation, or heterogeneous neurite rejects the entity
    * (custom_validation.py:32-95). */
  val MorphRules: Seq[Validation.Rule] = Seq(
    Validation.InRange("n_single_child", 0, 0),
    Validation.InRange("n_multifurc", 0, 0),
    Validation.InRange("n_hetero_neurites", 0, 0))

  /** the seeded EXISTING annotation store: one row per (entity,
    * compartment) for the closed-form subset (morph_id +
    * len(compartment)) % 3 == 0 over the three standard neurite
    * compartments, carrying its own revision and a stale (zero) body —
    * the q140 existing-store shape, made a persistable table. Built
    * from ids only: seeding never decodes a payload. */
  def existingStore(documents: DataFrame): DataFrame =
    documents.select(col("doc_id").as("morph_id"))
      .withColumn("neurite_type", explode(array(
        lit("axon"), lit("basal dendrite"), lit("apical dendrite"))))
      .filter((col("morph_id") + length(col("neurite_type"))) % 3 === 0)
      .select(
        annId(col("morph_id"), col("neurite_type")).as("ann_id"),
        col("morph_id"), col("neurite_type"),
        lit(0L).as("n_sections"), lit(0L).as("cum_len_um"),
        (col("morph_id") % 5 + 1).cast(LongType).as("rev"))

  /** composite merge key — the annotation resource identity (the
    * reference keys annotations by (morphology, compartment)); the
    * SAME [[Curation.annKey]] builder as the part-side stores. */
  private def annId(morphId: org.apache.spark.sql.Column,
                    neuriteType: org.apache.spark.sql.Column) =
    Curation.annKey(morphId, neuriteType)

  /** steps 2+3's input, off the PERSISTED report frame: one row per
    * computed (morphology, neurite type) annotation with the entity's
    * composed validator verdict. Row-local: metrics→verdict is the
    * shared-rule expression, features→rows is one explode; no payload,
    * no exchange. */
  private def ruleCol(r: Validation.Rule): String = r match {
    case Validation.InRange(c, _, _) => c
    case other => throw new IllegalArgumentException(
      s"MorphRules are range rules over metric columns, got ${other.name}")
  }

  def computedAnnotations(report: DataFrame): DataFrame = {
    val verdict = MorphRules
      .map(r => !coalesce(r.violation, lit(false)))
      .reduce(_ && _)
    report
      // the metric columns the rules reference, pulled by name (the
      // nested metrics record carries its own morph_id — `metrics.*`
      // would make the entity key ambiguous)
      .select(col("morph_id") +: col("features") +:
        MorphRules.map(r => col("metrics." + ruleCol(r)).as(ruleCol(r))): _*)
      .withColumn("valid", verdict)
      .select(col("morph_id"), col("valid"), explode(col("features")).as("f"))
      .select(col("morph_id"), col("valid"),
        col("f.neurite_type").as("neurite_type"),
        col("f.n_sections").as("n_sections"),
        col("f.cum_len_um").as("cum_len_um"))
  }

  /** step 3: the q140-shaped diff, gated by the validator — one action
    * row per computed annotation of a PASSING morphology: `create`
    * (rev 1) where the store has no (entity, compartment) row,
    * `update` (rev prev+1) where it does. Equi-join on the composite
    * key; the store side is data-sized, so no broadcast is assumed. */
  def annotationActions(computed: DataFrame, existing: DataFrame): DataFrame =
    computed.filter(col("valid"))
      .join(existing.select(col("morph_id").as("ex_id"),
          col("neurite_type").as("ex_nt"), col("rev").as("prev_rev")),
        col("morph_id") === col("ex_id") && col("neurite_type") === col("ex_nt"),
        "left")
      .select(col("morph_id"), col("neurite_type"),
        when(col("prev_rev").isNotNull, lit("update"))
          .otherwise(lit("create")).as("action"),
        col("n_sections"), col("cum_len_um"),
        (coalesce(col("prev_rev"), lit(0L)) + 1L).as("rev"))

  /** q141: the whole chain — build+persist the report, seed the store,
    * compute the gated actions off the persisted frame, push through
    * the REAL writer, read the post-merge state back. Output: the
    * store after the push, totally ordered — untouched rows keep their
    * seeded rev and stale body, updates carry the computed body at
    * rev prev+1, creates at rev 1. */
  def applyAndRead(spark: SparkSession, documents: DataFrame): DataFrame = {
    val base = graft.Scratch.dir("graft_curation_")
    val reportDir = s"$base/report"
    val storeDir = s"$base/store"
    NeuriteAtlas.morphReport(documents).write.mode("overwrite").parquet(reportDir)
    existingStore(documents).write.mode("overwrite").parquet(storeDir)
    val report = spark.read.parquet(reportDir)
    val actions = annotationActions(computedAnnotations(report),
      spark.read.parquet(storeDir))
    val updates = actions.select(
      annId(col("morph_id"), col("neurite_type")).as("ann_id"),
      col("morph_id"), col("neurite_type"),
      col("n_sections"), col("cum_len_um"), col("rev"))
    MergeWriter.applyTo(spark, storeDir, updates, "ann_id")
    spark.read.parquet(storeDir)
      .select("morph_id", "neurite_type", "n_sections", "cum_len_um", "rev")
      .orderBy("morph_id", "neurite_type")
  }
}

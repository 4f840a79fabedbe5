package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based schema/constraint validation — the Spark form of the
  * reference's conformance pipelines (reference
  * src/schemas/check_schema_validation.py, schema_validation.py:
  * collect all resources of a type, check each against the schema that
  * constrains it, report pass/fail).
  *
  * A schema here is a list of declarative [[Rule]]s; the report is a
  * single aggregation pass (every rule is a conditional count over the
  * same scan — one job, no matter how many rules), unpivoted to one row
  * per rule like the reference's per-check report rows.
  */
object Validation {

  sealed trait Rule { def name: String; def violation: Column }
  final case class NotNull(colName: String) extends Rule {
    val name = s"not_null_$colName"
    def violation: Column = col(colName).isNull
  }
  final case class InRange(colName: String, lo: Double, hi: Double) extends Rule {
    val name = s"range_$colName"
    def violation: Column = !col(colName).between(lo, hi)
  }
  final case class InSet(colName: String, values: Seq[String]) extends Rule {
    val name = s"enum_$colName"
    def violation: Column = !col(colName).isin(values: _*)
  }
  final case class Matches(colName: String, pattern: String) extends Rule {
    val name = s"regex_$colName"
    def violation: Column = !col(colName).rlike(pattern)
  }
  /** key uniqueness — counted as (count - count distinct), not per-row */
  final case class Unique(colName: String) extends Rule {
    val name = s"unique_$colName"
    def violation: Column = lit(false) // aggregated specially
  }
  /** completeness-conditional requiredness — the inner rule applies
    * only where `gate` holds; every other row satisfies it vacuously.
    * The reference's e-model field audit has exactly this split:
    * fields mandatory everywhere vs mandatory only for entities
    * flagged complete (reference src/e_model/expected_fields.py
    * `mandatory_fields` / `mandatory_if_complete_fields`,
    * :220-231 `_check_fields_arr` under `completeness_flag`). A gated
    * rule composes with [[report]], [[violations]] and the q96 matrix
    * unchanged — the gate is part of the violation expression, so the
    * plan stays one row-local scan. */
  final case class OnlyWhen(gate: Column, gateLabel: String, inner: Rule)
      extends Rule {
    require(!inner.isInstanceOf[Unique],
      "Unique aggregates globally and cannot be row-gated")
    val name = s"if_${gateLabel}_${inner.name}"
    def violation: Column = gate && inner.violation
  }

  /** One row per rule: (rule, n_violations), deterministic order. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs: Seq[Column] = rules.map {
      case u: Unique =>
        (count(col(u.colName)) - countDistinct(col(u.colName))).as(u.name)
      case r =>
        count(when(r.violation, 1)).as(r.name)
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.map(r => s"'${r.name}', ${r.name}").mkString(", ")
    wide.selectExpr(s"stack(${rules.size}, $stackArgs) AS (rule, n_violations)")
      .orderBy("rule")
  }

  /** Row-level violations for the row-expressible rules (the reference's
    * per-resource "fails validation" listing). */
  def violations(df: DataFrame, idCol: String, rules: Seq[Rule]): DataFrame = {
    val rowRules = rules.filter(!_.isInstanceOf[Unique])
    val checks = rowRules.map(r => when(r.violation, r.name))
    df.select(col(idCol), array(checks: _*).as("checks"))
      .select(col(idCol), array_compact(col("checks")).as("failed_rules"))
      .filter(size(col("failed_rules")) > 0)
  }

  /** q45: constraint-coverage reconciliation — the reference's
    * unconstrained/mismatched-constraint listings (reference
    * src/schemas/list_unconstrained.py, constraint_mismatch.py) as one
    * anti-join-shaped report: keys observed in the data's JSON payload
    * vs keys the schema registry declares a constraint for. `observed
    * && !declared` = unconstrained data; `declared && !observed` = a
    * stale constraint nothing carries any more. The observed side is
    * reduced to distinct keys before the join, so the exchange is key-
    * cardinality-sized regardless of row count. */
  def constraintCoverage(df: DataFrame, jsonCol: String,
                         declared: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val observed = df.select(explode(json_object_keys(col(jsonCol))).as("key"))
      .distinct().withColumn("observed", lit(true))
    val decl = declared.toDF("key").withColumn("declared", lit(true))
    observed.join(decl, Seq("key"), "full_outer")
      .select(col("key"),
        coalesce(col("observed"), lit(false)).as("observed"),
        coalesce(col("declared"), lit(false)).as("declared"))
      .withColumn("status",
        when(col("observed") && !col("declared"), "unconstrained")
          .when(!col("observed") && col("declared"), "stale_constraint")
          .otherwise("constrained"))
      .orderBy("key")
  }

  /** q96: the composed per-entity CHECK MATRIX — the orchestration
    * shape of the reference's two largest files (validator.py:1-532 and
    * trace/validation/validation.py:1-482: run N named checks per
    * entity, emit a pass/fail matrix the curator reads), built from
    * SHARED verdict definitions so the matrix cannot drift from the
    * standalone checks (q60 discipline):
    *
    *   - one `pass_<rule>` boolean per row-local [[Rule]] — THE SAME
    *     rule objects as q21b, with q21b's null semantics (a null
    *     violation verdict counts as pass: `violation IS NOT TRUE`);
    *   - `pass_has_lineitems` — the q20 reference-resolvability check;
    *   - `pass_item_count` — cardinality fence on the child table;
    *   - `pass_ship_after_order` — cross-table date consistency (the
    *     q27 declared-vs-computed family); vacuously true when there
    *     are no lineitems (that failure is has_lineitems' to report);
    *   - `n_failed` / `all_pass` — the workbook rollup columns.
    *
    * Scale shape: row rules are row-local on the orders scan; the child
    * table collapses through ONE map-side-combined per-order aggregate
    * before the (equi, AQE-splittable) join — no window, nothing
    * all-pairs, and adding more named checks adds zero exchanges. */
  def checkMatrix(orders: DataFrame, lineitem: DataFrame,
                  rules: Seq[Rule]): DataFrame = {
    val li = lineitem.groupBy(col("l_orderkey").as("__ok"))
      .agg(count(lit(1)).as("__n_items"), min(col("l_shipdate")).as("__min_ship"))
    val checks: Seq[(String, Column)] =
      rules.filter(!_.isInstanceOf[Unique]).map(r =>
        ("pass_" + r.name) -> !coalesce(r.violation, lit(false))) ++ Seq(
        "pass_has_lineitems" -> (coalesce(col("__n_items"), lit(0L)) >= 1),
        "pass_item_count" -> coalesce(col("__n_items").between(1, 7), lit(false)),
        "pass_ship_after_order" -> coalesce(col("__min_ship") >= col("o_orderdate"), lit(true)))
    orders.join(li, col("o_orderkey") === col("__ok"), "left")
      .select(col("o_orderkey") +: checks.map { case (n, c) => c.as(n) }: _*)
      .withColumn("n_failed",
        checks.map { case (n, _) => when(col(n), 0).otherwise(1) }.reduce(_ + _))
      .withColumn("all_pass", col("n_failed") === 0)
      .orderBy("o_orderkey")
  }

  /** q97: BUNDLE COMPLETENESS — the reference's expected-member check
    * for composed entities (e_model/expected_fields.py:16-17: an
    * e-model bundle must carry one member of each expected class —
    * generates_members / has_part_members — and the script walks every
    * bundle reporting what is missing). Spark form: member classes
    * collected DISTINCT per parent in one map-side-combined aggregate,
    * missing = expected ∖ present, parents with no members at all
    * report the full expected set (left join). Class lists are emitted
    * as sorted comma-joined strings — deterministic, and hash-friendly
    * for the oracle compare. */
  def bundleCompleteness(parents: DataFrame, parentKey: String,
                         members: DataFrame, memberKey: String,
                         classCol: Column, expected: Seq[String]): DataFrame = {
    val agg = members.groupBy(col(memberKey).as("__k"))
      .agg(collect_set(classCol).as("__present"))
    val expectedCol = array(expected.map(lit): _*)
    parents.join(agg, col(parentKey) === col("__k"), "left")
      .select(col(parentKey),
        coalesce(col("__present"), expr("CAST(array() AS ARRAY<STRING>)")).as("__p"))
      .select(col(parentKey),
        concat_ws(",", array_sort(col("__p"))).as("present_classes"),
        concat_ws(",", array_sort(array_except(expectedCol, col("__p"))))
          .as("missing_classes"),
        // counted on the ARRAY, not the joined string: a class value
        // containing a comma (or an empty-string class) would miscount
        // through a split; the string columns stay for display/hash
        size(array_except(expectedCol, col("__p"))).cast("long").as("n_missing"))
      .withColumn("complete", col("n_missing") === 0)
      .orderBy(parentKey)
  }

  /** q99: TYPE × BUCKET × SCHEMA-PRESENCE matrix — the reference's
    * schemas-module exploration workbook (reference
    * src/schemas/type_exploration.py:21-60: per bucket, which resource
    * types are present, joined against the schema registry;
    * getters.get_missing_schemas: observed types with no schema). One
    * row per bucket: a fixed count column per type (the q10 pivot
    * discipline — literal values, so the schema is static and
    * oracle-comparable), the distinct-type count, and the present
    * types the registry carries no schema for.
    *
    * Scale shape: ONE map-side-combined groupBy-pivot keyed by the
    * bucket; registry membership is a compile-time literal partition
    * of the type list, so everything after the aggregate is row-local
    * arithmetic. Adding types widens columns, never adds exchanges. */
  def typeSchemaPivot(df: DataFrame, bucketCol: String, typeCol: String,
                      types: Seq[String], withSchema: Seq[String]): DataFrame = {
    val ts = types.sorted
    val unschematized = ts.filterNot(withSchema.contains)
    val pivoted = df.groupBy(col(bucketCol).as("bucket"))
      .pivot(typeCol, ts)
      .agg(count(lit(1)))
      .select(col("bucket") +:
        ts.map(t => coalesce(col(s"`$t`"), lit(0L)).as(s"cnt_$t")): _*)
    pivoted
      .withColumn("n_types",
        ts.map(t => when(col(s"cnt_$t") > 0, 1L).otherwise(0L)).reduce(_ + _))
      .withColumn("unschematized_types",
        concat_ws(",", unschematized.map(t =>
          when(col(s"cnt_$t") > 0, lit(t))): _*))
      .withColumn("n_unschematized",
        if (unschematized.isEmpty) lit(0L)
        else unschematized.map(t => when(col(s"cnt_$t") > 0, 1L).otherwise(0L))
          .reduce(_ + _))
      .orderBy("bucket")
  }

  /** q21b: the same listing exploded to one (id, rule) row — the
    * flat shape that joins/sorts/compares cleanly downstream. Checks
    * stay row-local over a single scan; the only exchange is the
    * deterministic output sort. */
  def violationRows(df: DataFrame, idCol: String, rules: Seq[Rule]): DataFrame =
    violations(df, idCol, rules)
      .select(col(idCol), explode(col("failed_rules")).as("rule"))
      .orderBy(idCol, "rule")
}

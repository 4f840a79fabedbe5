package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Decimals._

/** Relational query core — the Spark re-expression of the reference's
  * query surface (ES/SPARQL filtered retrieval, tabulated reports,
  * aggregated views; cf. reference src/schemas/query_data.py:79,
  * src/view_aggregate/aggregate_default_views_obp.py).
  *
  * Every query ends in a total-order sort so results are comparable
  * row-for-row with the DuckDB oracle. All plans are declarative
  * DataFrame compositions: filters/projections reach the parquet scan,
  * joins shuffle on their keys (dimension sides broadcast), and
  * aggregation is partial (map-side combine) by construction.
  */
object Relational {

  /** q01: grouped aggregation with exact decimal sums (TPC-H Q1 shape —
    * the reference's batch metric tabulation, quality_metric.py:83). */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum2(col("l_quantity")).as("sum_qty"),
        sum2(col("l_extendedprice")).as("sum_base_price"),
        sumRevenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q02: predicate + projection pushdown scan (type/deprecated filter,
    * get_resources_by_type_es). Only 3 of 6 columns read; both filters
    * reach the parquet reader. */
  def filterProject(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") === "click" && col("value") > 10.0)
      .select("event_id", "user_id", "value")
      .orderBy("event_id")

  /** q03: multi-way join + aggregation (cross-bucket link resolution
    * rolled up per ontology term). nation is dimension-sized →
    * broadcast; the fact-fact join shuffles on the order key. */
  def joinRevenue(lineitem: DataFrame, orders: DataFrame,
                  customer: DataFrame, nation: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        sumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")

  /** q04: top-k with deterministic tiebreak ("most recent N"). TakeOrdered
    * physical op: no full sort, no full shuffle. */
  def topK(orders: DataFrame, k: Int = 10): DataFrame =
    orders
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(k)

  /** q05: window rank — latest revision per entity (the reference's
    * tag/version pick, query_data.py filter_by_tag). */
  def latestOrderPerCustomer(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast(DateType).as("o_orderdate"), col("o_totalprice"))
      .orderBy("o_custkey")
  }

  /** q06: EXISTS / NOT EXISTS — resources with/without a linked
    * annotation, per segment. One pass over customers; the distinct
    * order-key side is pre-aggregated before the join. */
  def semiAntiCounts(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders.select(col("o_custkey").as("ok")).distinct(),
        col("c_custkey") === col("ok"), "left")
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_customers"),
        count(col("ok")).as("with_orders"),
        count(when(col("ok").isNull, 1)).as("without_orders"))
      .orderBy("c_mktsegment")

  /** q07: distinct cardinality report (type/schema cardinality,
    * check_schema_validation.py summary). min/max on raw doubles are
    * order-independent → oracle-safe without decimal casts. */
  def distinctAgg(orders: DataFrame): DataFrame =
    orders
      .groupBy("o_orderstatus")
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        sum2(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderstatus")

  /** q08: rollup region→nation (aggregated views across buckets with
    * subtotals + grand total). Rollup nulls are labelled so the output
    * is null-free and sorts identically in both engines. */
  def rollupAcctbal(region: DataFrame, nation: DataFrame,
                    customer: DataFrame): DataFrame = {
    val joined = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name", "c_acctbal")
    // ROLLUP via SQL: Dataset.rollup on a join output trips Spark 4.1's
    // ambiguous-self-join detector (false positive from the Expand node
    // re-tagging the grouping attributes); the SQL path has no Dataset
    // column lineage and plans the identical Aggregate(Expand(...)).
    joined.createOrReplaceTempView("graft_rollup_src")
    joined.sparkSession.sql(
      """SELECT coalesce(r_name, '(all)') AS r_name,
        |       coalesce(n_name, '(all)') AS n_name,
        |       count(1) AS n_customers,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) * 100 AS BIGINT) AS sum_acctbal
        |FROM graft_rollup_src
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY 1, 2""".stripMargin)
  }

  /** q09: union of heterogeneous "buckets" into one view then aggregate
    * (aggregate_default_views_obp.py). unionByName keeps the mapping
    * declarative; per-kind partial aggregation before the broadcast
    * join keeps the shuffle tiny. */
  def unionBuckets(customer: DataFrame, supplier: DataFrame,
                   nation: DataFrame): DataFrame = {
    val cust = customer.select(
      concat(lit("C"), col("c_custkey")).as("party_id"),
      col("c_nationkey").as("nationkey"),
      col("c_acctbal").as("acctbal"),
      lit("customer").as("kind"))
    val supp = supplier.select(
      concat(lit("S"), col("s_suppkey")).as("party_id"),
      col("s_nationkey").as("nationkey"),
      col("s_acctbal").as("acctbal"),
      lit("supplier").as("kind"))
    cust.unionByName(supp)
      .join(broadcast(nation), col("nationkey") === col("n_nationkey"))
      .groupBy("n_name", "kind")
      .agg(count(lit(1)).as("n_parties"), sum2(col("acctbal")).as("sum_acctbal"))
      .orderBy("n_name", "kind")
  }

  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** q10: pivot event_type → per-user counts (tabulated validation
    * summary, one column per check). Explicit value list keeps the
    * pivot single-pass (no extra distinct job). */
  def pivotEvents(events: DataFrame): DataFrame = {
    val pivoted = events
      .groupBy("user_id")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    pivoted.select(
      col("user_id") +:
        EventTypes.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
      .orderBy("user_id")
  }

  /** q11: running total per entity over time (trace time-series
    * summaries). One shuffle on user_id; the frame is ROWS-based so the
    * sort within partition is the only extra work. */
  def runningTotals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("event_id"), col("user_id"),
        // epoch µs as bigint: tz-tag-free, exact in both engines
        unix_micros(col("ts")).as("ts_us"),
        asScaledLong(sum(dec6(col("value"))).over(w), 6).as("running_value"))
      .orderBy("event_id")
  }

  /** q12: groups above the global mean without division — cross-multiply
    * (sum_g * n_total > sum_total * n_g) keeps everything in exact
    * decimal/integer arithmetic. The global aggregate is a 1-row
    * broadcast. */
  def aboveAverageNations(customer: DataFrame, nation: DataFrame): DataFrame = {
    val perNation = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(dec2(col("c_acctbal"))).as("sum_bal"), count(lit(1)).as("n_cust"))
    val global = customer
      .agg(sum(dec2(col("c_acctbal"))).as("g_sum"), count(lit(1)).as("g_cnt"))
    perNation.crossJoin(broadcast(global))
      .filter(col("sum_bal") * col("g_cnt") > col("g_sum") * col("n_cust"))
      .select(col("n_name"), asScaledLong(col("sum_bal"), 2).as("sum_acctbal"),
        col("n_cust").as("n_customers"))
      .orderBy("n_name")
  }

  /** q14: order-statistics report — exact interpolated percentiles per
    * group (the reference's quality-report distribution columns). The
    * sketch twins (approx_percentile / approx_count_distinct HLL) are
    * the 100 TB path and are covered with tolerance asserts in
    * ScaleSpec — approximate answers can't be hash-compared across
    * engines. */
  def percentileReport(orders: DataFrame): DataFrame =
    orders
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        expr("percentile(o_totalprice, 0.25)").as("p25"),
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.75)").as("p75"),
        expr("percentile(o_totalprice, 0.99)").as("p99"))
      .orderBy("o_orderstatus")

  /** q17: sketch-based cardinality report — the KMV custom aggregate
    * next to the exact answer (per group). The sketch is keyed by a
    * 60-bit md5-prefix hash BOTH engines can compute identically, so
    * the sketch content (k-th minimum), its size, and the integer-
    * floored estimate are all exactly oracle-checkable — the sketch
    * aggregate's union-truncate merge is what the oracle exercises.
    * (The tolerance contract of the estimator itself is asserted in
    * KmvSketchSpec.) */
  def kmvDistinctReport(documents: DataFrame): DataFrame = {
    val k = 64
    val h = conv(substring(md5(col("text")), 1, 15), 16, 10).cast(LongType)
    val sketchSize = size(col("sketch"))
    val kth = element_at(col("sketch"), sketchSize) // ascending: last = k-th min
    documents
      .groupBy("source")
      .agg(
        graft.functions.KmvSketch.kmv_sketch(h, k).as("sketch"),
        countDistinct(col("text")).as("exact_distinct"))
      .select(col("source"),
        sketchSize.cast(LongType).as("sketch_size"),
        kth.as("kth_min"),
        when(sketchSize < k, sketchSize.cast(LongType))
          .otherwise(floor(lit((k - 1).toDouble * math.pow(2, 60)) / kth.cast(DoubleType)))
          .as("est_distinct"),
        col("exact_distinct"))
      .orderBy("source")
  }

  /** q13: JSON metadata extraction (the reference's JSON-LD payload
    * fields, _payload_to_resource in schemas/query_data.py:28). Codegen
    * JSON path, no UDF. */
  def jsonExtract(events: DataFrame): DataFrame =
    events
      .select(get_json_object(col("props"), "$.k").cast(IntegerType).as("k"),
        col("value"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), sum6(col("value")).as("sum_value"))
      .orderBy("k")
}

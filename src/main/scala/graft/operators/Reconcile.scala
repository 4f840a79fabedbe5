package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-index reconciliation — the Spark form of the reference's
  * search-index discrepancy report (reference
  * src/search_index/search_index_discrepancy.py: query two indexes/
  * views for the same buckets and list what each returns that the
  * other doesn't).
  *
  * One full-outer shuffle join on the id; per-side presence flags; the
  * report keeps only the symmetric difference. Both inputs are reduced
  * to distinct ids first, so the join carries one narrow row per id —
  * at 100 TB the pre-aggregation makes the exchange proportional to
  * the id cardinality, not the raw row count.
  */
object Reconcile {

  /** Per-id discrepancy listing: ids present in exactly one side, with
    * presence flags and the side label. */
  def discrepancyReport(a: DataFrame, b: DataFrame, key: String): DataFrame = {
    val ia = a.select(col(key)).distinct().withColumn("in_a", lit(true))
    val ib = b.select(col(key)).distinct().withColumn("in_b", lit(true))
    ia.join(ib, Seq(key), "full_outer")
      .select(col(key),
        coalesce(col("in_a"), lit(false)).as("in_a"),
        coalesce(col("in_b"), lit(false)).as("in_b"))
      .filter(!(col("in_a") && col("in_b")))
      .withColumn("side", when(col("in_a"), "only_a").otherwise("only_b"))
      .orderBy(key)
  }

  /** Roll-up of the listing: how many ids each side is missing. */
  def summary(a: DataFrame, b: DataFrame, key: String): DataFrame =
    discrepancyReport(a, b, key)
      .groupBy("side").agg(count(lit(1)).as("n_ids"))
      .orderBy("side")
}

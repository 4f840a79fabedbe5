package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale tooling: the join-shape utilities a 100 TB deployment leans on
  * when AQE alone isn't enough — key salting for pathological skew and
  * bucketed (pre-shuffled) table layout for repeated co-located joins.
  */
object Scale {

  /** Inner join with the left side's hot keys spread over `salts`
    * sub-keys and the right side replicated once per salt. Result
    * multiplicity is identical to a plain inner join: each left row
    * carries exactly one deterministic salt, and each right row exists
    * under every salt. Use when one key holds a partition-breaking
    * share of the rows and AQE's skew split can't help (e.g. a
    * broadcast-too-big dimension with one hot entry).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(left.columns.map(col).toSeq: _*), lit(salts)))
    val saltedRight = right
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Write a frame bucketed+sorted by `key` as a managed table —
    * repeated joins/aggregations on `key` then read pre-shuffled
    * (no Exchange under the join). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
}

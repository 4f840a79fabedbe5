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

  /** Hot join keys decided from the data itself: the Misra-Gries
    * sketch surfaces candidates without shuffling the key domain, the
    * exact verify pass keeps only keys above `hotShareBp` basis points
    * of the rows (same two-pass shape as
    * [[Frequency.exactHeavyHitters]]). Works for ANY key type — urls,
    * tokens, ids — by sketching over xxhash64(key); a hash collision
    * only inflates the candidate superset, the per-key verify count
    * stays exact. The result is a bounded, broadcast-sized model
    * (≤ capacity keys) — the "column statistics" a static planner
    * would read from a catalog, computed in one cheap pass when there
    * is no catalog. */
  def hotKeys(df: DataFrame, key: String, hotShareBp: Int = 100,
              capacity: Int = 1024): Seq[Any] = {
    require((capacity + 1).toLong * hotShareBp >= 10000L,
      s"capacity $capacity too small for share=$hotShareBp bp")
    val keyed = df.select(col(key).as("k"), xxhash64(col(key)).as("kh"))
      .filter(col("k").isNotNull)
    val cands = keyed
      .agg(graft.functions.MgSketch.mg_sketch(col("kh"), capacity).as("c"),
        count(lit(1)).as("n_total"))
      .select(explode(col("c")).as("kh"), col("n_total"))
    keyed.join(broadcast(cands), Seq("kh"))
      .groupBy("k", "n_total").agg(count(lit(1)).as("n"))
      .filter(col("n") * 10000L > col("n_total") * hotShareBp)
      .select("k").collect().map(_.get(0)).toSeq
  }

  /** Stats-driven skew join: only rows carrying a HOT key (share >
    * `hotShareBp` bp, measured, not guessed) take the salted path —
    * the right side is replicated `salts`× for the handful of hot keys
    * only, while the cold majority joins plain. Equivalent to an inner
    * join on `key` for non-null keys. Use when one key holds a
    * partition-breaking share AND the right side is too big to
    * broadcast; AQE's skew split handles the sort-merge case, but this
    * also covers repeated hash joins and gives the planner no chance to
    * regress. */
  def skewAwareJoin(left: DataFrame, right: DataFrame, key: String,
                    salts: Int, hotShareBp: Int = 100): DataFrame = {
    val hot = hotKeys(left, key, hotShareBp)
    if (hot.isEmpty) left.join(right, Seq(key))
    else {
      val lh = left.filter(col(key).isin(hot: _*))
        .withColumn("__salt", pmod(hash(left.columns.map(col).toSeq: _*), lit(salts)))
      val rh = right.filter(col(key).isin(hot: _*))
        .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      val hotJoined = lh.join(rh, Seq(key, "__salt")).drop("__salt")
      val cold = left.filter(!col(key).isin(hot: _*))
        .join(right.filter(!col(key).isin(hot: _*)), Seq(key))
      hotJoined.unionByName(cold)
    }
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

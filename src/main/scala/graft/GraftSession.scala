package graft

import org.apache.spark.sql.SparkSession

/** Session factory used by tests and ad-hoc mains.
  *
  * Verify/Bench build their own sessions (driver contract) — this keeps
  * one place for the scale-relevant conf so local runs match what we'd
  * ship to a cluster: AQE on (runtime re-plan + skew join), shuffle
  * partitions sized to the machine rather than the 200 default, UTC so
  * timestamp results match the DuckDB oracle.
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // runtime Bloom-filter join pruning: a selective dimension filter
      // is pushed into the fact-side scan as a might_contain predicate —
      // at 100 TB this prunes most of a link-check/enrichment join's
      // probe side before the shuffle. Size thresholds stay at Spark's
      // defaults (creation side ≤10MB); ScaleSpec proves the injection.
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

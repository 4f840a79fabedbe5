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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

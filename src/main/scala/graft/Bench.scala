package graft
import org.apache.spark.sql.SparkSession

/** Driver benchmark: ONE JSON line on stdout. `queries`/`value` are the
  * historical cold single-shot figures (first timed run of each query
  * in a warm JVM); `queries_warm_median`/`warm_median_total` ride along
  * in the same object — warm medians over SPARK_GRAFT_MEDIAN_REPS
  * repeat runs per query (default 3). Single-shot timings on a shared
  * box are load-noise-dominated (identical code has spread 1.3–2.1s on
  * one query across rounds); the medians are the signal to trust when
  * comparing rounds, and emitting both keeps old BENCH files
  * comparable. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // clamped to >= 1: the median of zero reps is undefined, and dying
    // after timing every query would lose the whole run's output
    val medianReps = sys.env.getOrElse("SPARK_GRAFT_MEDIAN_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/parquet-footer costs land here, not
    // on whichever query happens to run first
    try SparkEntry.queries.headOption.foreach(_._2(spark, sfDir).count()) catch { case _: Throwable => }
    // ... and the parquet WRITE path (committer + FileFormatWriter init),
    // which otherwise lands entirely on the first writer query (q43)
    try {
      val wdir = java.nio.file.Files.createTempDirectory("graft_bench_warm_").toString + "/t"
      spark.range(2).write.mode("overwrite").parquet(wdir)
      spark.read.parquet(wdir).count()
    } catch { case _: Throwable => }
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val cold = time(fn)
      val warm = (1 to medianReps).map(_ => time(fn)).sorted
      (name, cold, warm(warm.length / 2))
    }
    def obj(f: ((String, Double, Double)) => (String, Double)): String =
      results.map { r => val (k, v) = f(r); s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    val cold = obj { case (k, c, _) => k -> c }
    val warm = obj { case (k, _, m) => k -> m }
    val total = results.map(_._2).sum
    val warmTotal = results.map(_._3).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$cold,""" +
      s""""queries_warm_median":$warm,"warm_median_total":$warmTotal,""" +
      s""""warm_reps":$medianReps,"sf":"$sfDir"}""")
    spark.stop()
  }
}

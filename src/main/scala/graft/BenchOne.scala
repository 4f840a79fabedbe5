package graft
/** Dev helper: time a subset of queries (args = names). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    args.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[benchone] $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

/** Statistical microbench: WARM medians over SPARK_GRAFT_REPS runs per
  * query (args = names; no args = full inventory). Single-shot
  * timings on a shared box are load-noise-dominated — medians are what
  * to trust when comparing operator variants. Prints one JSON line per
  * query. */
object BenchStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = GraftSession.local(32)
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // untimed warmup (plan+codegen)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = ts(ts.length / 2)
      println(f"""{"query":"$name","median_s":$med%.3f,"min_s":${ts.head}%.3f,"max_s":${ts.last}%.3f,"reps":$reps}""")
    }
    spark.stop()
  }
}

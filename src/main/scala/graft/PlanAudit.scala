package graft
/** Dev tool: dump formatted physical plans for the named queries (or a
  * default headline set) so shuffle/pushdown/broadcast shapes can be
  * reviewed. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local(8)
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q03_join_revenue", "q22_quality_metrics",
        "q31_dedup_minhash", "q34_dedup_embedding", "q50_stream_window",
        "q47_heavy_hitters", "q75_rarity_screen", "q76b_pq_adc", "q78_ivf_pq")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}

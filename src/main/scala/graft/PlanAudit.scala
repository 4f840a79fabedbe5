package graft
/** Dev tool: dump formatted physical plans for the named queries (or a
  * default headline set) so shuffle/pushdown/broadcast shapes can be
  * reviewed. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local(8)
    // --unpushed <names...>: the r18 pruning audit — per named query,
    // print every scan whose dataFilters did NOT translate into pushed
    // source filters (the PLANS `scans_filtered_unpushed` flag), with
    // the untranslated expressions, so "semantic full scan" vs "real
    // pruning bug" is decided on the expressions, not on vibes.
    if (args.headOption.contains("--unpushed")) {
      args.drop(1).foreach { n =>
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.queryExecution.toRdd.count()
        graft.plans.PlanWalk.nodes(df.queryExecution.executedPlan).collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.dataFilters.nonEmpty &&
              !s.metadata.get("PushedFilters").exists(f => f.nonEmpty && f != "[]") =>
            println(s"[unpushed] $n table=${s.relation.location.rootPaths.mkString(",")}" +
              s" dataFilters=${s.dataFilters.map(_.sql).mkString(" AND ")}")
        }
      }
      spark.stop(); return
    }
    // --executed <names...>: run each query and print the FINAL
    // post-AQE executed plan (explain formatted shows the initial
    // adaptive plan only — runtime decisions like ReusedExchange and
    // AQE join rewrites are invisible there).
    if (args.headOption.contains("--executed")) {
      args.drop(1).foreach { n =>
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.queryExecution.toRdd.count()
        println(s"\n========== $n (executed) ==========")
        println(df.queryExecution.executedPlan.toString())
      }
      spark.stop(); return
    }
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

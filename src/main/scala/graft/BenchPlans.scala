package graft

/** Plan-inventory artifact (r17): every round the verdict hand-reads
  * the expensive queries' plans for scale-killers (cartesian products,
  * unpartitioned windows, unpruned scans, data-sized broadcasts); this
  * main makes that audit a GREPPABLE ARTIFACT over the whole 179-query
  * inventory — per query, the executed (post-AQE) plan's structural
  * counts, walked by THE SAME [[graft.plans.PlanWalk]] the plan-pin
  * specs and MutationPinSpec use, so the inventory cannot disagree
  * with the fences about what a plan contains.
  *
  * Per query: shuffle exchanges (and how many carry BinaryType),
  * broadcast exchanges, join strategies (BHJ/SMJ/SHJ/BNLJ/cartesian),
  * window nodes (and how many are UNPARTITIONED — the global-sort
  * smell), global sorts, v1 parquet scans with their read-column
  * widths and whether filters reached the scan, and whole-stage
  * codegen span count. The summary lists every query flagged for a
  * cartesian product or an unpartitioned window so drift from the
  * standing invariants (cartesian only in q35's stated brute-force
  * contract; exactly one bounded unpartitioned window in the tree) is
  * one grep away.
  *
  * Caveat stamped into the artifact: writer queries (q43/q82/q141 …)
  * run their MERGE jobs eagerly inside the query function; the
  * inventory covers the RETURNED frame's plan (the read-back), not
  * the writer's internal jobs — those are spec-pinned where they
  * matter (MergeWriterSpec, CurationPipelineSpec). */
object BenchPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.local(cpus.toInt)
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.exchange.{ShuffleExchangeLike, BroadcastExchangeLike}
    import org.apache.spark.sql.execution.joins._
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val df = fn(spark, sfDir)
      df.queryExecution.toRdd.count() // finalize the adaptive plan
      val ns = graft.plans.PlanWalk.nodes(df.queryExecution.executedPlan)
      val shuffles = ns.collect { case s: ShuffleExchangeLike => s }
      val scans = ns.collect { case s: FileSourceScanExec => s }
      val windows = ns.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
      val counts = Seq(
        "shuffles" -> shuffles.length,
        "binary_shuffles" -> shuffles.count(_.output.exists(
          _.dataType == org.apache.spark.sql.types.BinaryType)),
        "bcast_exchanges" -> ns.count(_.isInstanceOf[BroadcastExchangeLike]),
        "bhj" -> ns.count(_.isInstanceOf[BroadcastHashJoinExec]),
        "smj" -> ns.count(_.isInstanceOf[SortMergeJoinExec]),
        "shj" -> ns.count(_.isInstanceOf[ShuffledHashJoinExec]),
        "bnlj" -> ns.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
        "cartesian" -> ns.count(_.isInstanceOf[CartesianProductExec]),
        "windows" -> windows.length,
        "windows_unpartitioned" -> windows.count(_.partitionSpec.isEmpty),
        "sorts_global" -> ns.collect { case s: SortExec if s.global => s }.length,
        "scans" -> scans.length,
        "scan_cols" -> scans.map(_.requiredSchema.size).sum,
        "scans_with_pushed_filters" -> scans.count(s =>
          s.metadata.get("PushedFilters").exists(f => f.nonEmpty && f != "[]")),
        "wholestage_spans" -> ns.count(_.isInstanceOf[WholeStageCodegenExec]),
        "nodes" -> ns.length)
      System.err.println(s"[plans] $name " +
        counts.map { case (k, v) => s"$k=$v" }.mkString(" "))
      name -> counts
    }
    def obj(kvs: Seq[(String, Int)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val keys = rows.head._2.map(_._1)
    val totals = keys.map(k => k -> rows.map(_._2.toMap.apply(k)).sum)
    def flagged(k: String): String = rows.collect {
      case (n, cs) if cs.toMap.apply(k) > 0 => "\"" + n + "\""
    }.mkString("[", ",", "]")
    val detail = s"""{"metric":"plan_inventory","sf":"$sfDir",""" +
      s""""n_queries":${rows.length},""" +
      s""""note":"executed post-AQE plans of each query's returned frame, walked by graft.plans.PlanWalk (the fence walker); writer queries' internal MERGE jobs are spec-pinned, not inventoried",""" +
      s""""totals":${obj(totals)},""" +
      s""""flagged_cartesian":${flagged("cartesian")},""" +
      s""""flagged_window_unpartitioned":${flagged("windows_unpartitioned")},""" +
      s""""flagged_binary_shuffles":${flagged("binary_shuffles")},""" +
      s""""queries":${rows.map { case (n, cs) => "\"" + n + "\":" + obj(cs) }
        .mkString("{", ",", "}")}}"""
    println(detail)
    val requested = sys.env.get("SPARK_GRAFT_PLANS").getOrElse(
      sys.env.get("SPARK_GRAFT_ROUND")
        .map(r => s"PLANS_r$r.json").getOrElse("PLANS.json"))
    try {
      val target = Bench.writeNew(detail, requested)
      System.err.println(s"[plans] artifact persisted to $target")
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[plans] could not persist $requested: $e") }
    spark.stop()
  }
}

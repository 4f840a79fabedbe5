package graft

/** THE plan walk + fence predicates the plan-pin specs share — one
  * definition (review finding r16: the walker existed in three specs;
  * a drifted copy that stopped descending a new AQE node type would
  * let MutationPinSpec keep "proving" a fence bites while the real
  * fence in MultimodalSpec had gone blind). MutationPinSpec
  * mutation-tests exactly these predicates, so a blind spot here
  * fails the suite. */
object PlanWalks {

  def nodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: nodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: nodes(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      p +: nodes(r.child)
    case _ => p +: p.children.flatMap(nodes)
  }

  def shuffleExchanges(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike] =
    nodes(df.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => s
    }

  /** the one-blob-exchange fence predicate: executes the plan (so the
    * adaptive form is final), counts shuffle exchanges whose rows
    * carry a BinaryType column. */
  def blobExchanges(df: org.apache.spark.sql.DataFrame): Int = {
    df.queryExecution.toRdd.count()
    shuffleExchanges(df).count(_.output.exists(
      _.dataType == org.apache.spark.sql.types.BinaryType))
  }

  /** plan nodes whose output carries a BinaryType column (the
    * zero-binary-downstream pin), after executing the plan. */
  def binaryCarryingNodes(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    df.queryExecution.toRdd.count()
    nodes(df.queryExecution.executedPlan)
      .filter(_.output.exists(
        _.dataType == org.apache.spark.sql.types.BinaryType))
  }
}

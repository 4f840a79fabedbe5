package graft

/** Test-tree alias for [[graft.plans.PlanWalk]] — THE plan walk + fence
  * predicates the plan-pin specs share. One definition (review finding
  * r16: the walker existed in three specs; a drifted copy that stopped
  * descending a new AQE node type would let MutationPinSpec keep
  * "proving" a fence bites while the real fence in MultimodalSpec had
  * gone blind). r17 moved the definition to the main tree so the
  * BenchPlans inventory main walks with the SAME eyes the fences use;
  * this object stays as the specs' import point and MutationPinSpec
  * mutation-tests exactly these predicates, so a blind spot here
  * fails the suite. */
object PlanWalks {

  def nodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    graft.plans.PlanWalk.nodes(p)

  def shuffleExchanges(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike] =
    graft.plans.PlanWalk.shuffleExchanges(df)

  def blobExchanges(df: org.apache.spark.sql.DataFrame): Int =
    graft.plans.PlanWalk.blobExchanges(df)

  def binaryCarryingNodes(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    graft.plans.PlanWalk.binaryCarryingNodes(df)
}

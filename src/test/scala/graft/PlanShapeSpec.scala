package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MergeWriter, Ontology, Similarity, Upsert}

/** Physical-plan regression guards for the scale-critical shapes: the
  * operators below were specifically (re)designed so their plans
  * survive a 100 TB scale-up — these specs pin the shape so a refactor
  * can't silently reintroduce a quadratic join, a shuffle join on a
  * dimension table, or a full per-key sort. */
class PlanShapeSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  test("banded near-dup plans no quadratic join") {
    val plan = Similarity.nearDupPairsBanded(Tables.embeddings(spark, dir))
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"), "cartesian crept back in")
    assert(!plan.contains("BroadcastNestedLoop"), "nested-loop join crept back in")
  }

  test("ANN rankers run on the bounded-heap TopKPerKey operator") {
    Seq(
      "brute" -> Similarity.knnBruteForce(Tables.embeddings(spark, dir)),
      "lsh" -> Similarity.knnLsh(Tables.embeddings(spark, dir)),
      "ivf" -> Similarity.knnIvf(Tables.embeddings(spark, dir))
    ).foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString()
      assert("TopKPerKey \\[".r.findAllIn(plan).length == 2,
        s"$name: expected the two-phase TopKPerKey exec")
    }
  }

  test("ontology closure uses only broadcast joins") {
    val plan = Ontology.geoClosure(Tables.region(spark, dir), Tables.nation(spark, dir))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), "edge joins should broadcast")
    assert(!plan.contains("SortMergeJoin"), "dimension-sized closure must not shuffle-join")
  }

  test("heavy-hitter verify pass broadcasts the candidate set") {
    val plan = graft.operators.Frequency.eventKeyHeavyHitters(Tables.events(spark, dir))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"),
      "pass-2 exact count must join against broadcast candidates, not shuffle the domain")
    assert(!plan.contains("SortMergeJoin"), "no shuffle join anywhere in the 2-pass plan")
  }

  test("merge writer plans one full-outer join on the key") {
    val plan = MergeWriter.mergedState(
      Upsert.target(Tables.customer(spark, dir)),
      Upsert.updates(Tables.orders(spark, dir), Tables.supplier(spark, dir)),
      "c_custkey", Some("is_deleted"))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("FullOuter"), "merge must be a single full-outer join")
  }
}

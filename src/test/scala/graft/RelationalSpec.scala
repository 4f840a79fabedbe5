package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("entry flagship query returns grouped rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("sum_qty"))
  }

  test("every declared query runs and every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("q04 topk is sorted desc with tiebreak") {
    val rows = SparkEntry.queries("q04_topk")(spark, sf).collect()
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sortBy(-_)))
    assert(rows.length == 10)
  }

  test("q06 semi/anti counts partition the customer set") {
    val rows = SparkEntry.queries("q06_semi_anti")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("with_orders") + r.getAs[Long]("without_orders")
        == r.getAs[Long]("n_customers"))
    }
  }

  test("q08 rollup grand total equals sum of nation rows") {
    val rows = SparkEntry.queries("q08_rollup")(spark, sf).collect()
    val grand = rows.filter(r => r.getString(0) == "(all)" && r.getString(1) == "(all)")
    val leaves = rows.filter(r => r.getString(0) != "(all)" && r.getString(1) != "(all)")
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n_customers") == leaves.map(_.getAs[Long]("n_customers")).sum)
  }

  test("q02 pushes filters and prunes columns at the parquet scan") {
    val df = SparkEntry.queries("q02_filter_project")(spark, sf)
    val scan = df.queryExecution.executedPlan.toString()
    assert(scan.contains("PushedFilters:"), "no pushed filters in plan")
    assert(scan.contains("IsNotNull(event_type)") || scan.contains("EqualTo(event_type,click)"),
      s"event_type filter not pushed:\n$scan")
    assert(!scan.contains("props"), "props column should be pruned from the scan")
  }

  test("q03 broadcasts the nation dimension") {
    val df = SparkEntry.queries("q03_join_revenue")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink coverage (SURVEY.md §2E): csv/json round trips and
  * partitioned parquet writes — the report outputs the reference emits
  * as CSV/TSV/JSON (check_links.csv, batch_report.tsv, per-resource
  * json). */
class SourcesSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("csv round trip preserves the link-check report") {
    val report = SparkEntry.queries("q20_link_check")(spark, sf).limit(100)
    val dir = tmp("graft_csv")
    report.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.count() == report.count())
    assert(back.columns.sorted.sameElements(report.columns.sorted))
  }

  test("json round trip preserves values") {
    val df = SparkEntry.queries("q21_schema_validation")(spark, sf)
    val dir = tmp("graft_json")
    df.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == df.count())
  }

  test("tsv (tab-delimited csv) report like the reference batch report") {
    val df = SparkEntry.queries("q22_quality_metrics")(spark, sf).limit(50)
    val dir = tmp("graft_tsv")
    df.write.mode("overwrite").option("sep", "\t").option("header", "true").csv(dir)
    val back = spark.read.option("sep", "\t").option("header", "true").csv(dir)
    assert(back.count() == 50)
  }

  test("partitioned parquet write produces partition directories and prunes") {
    val dir = tmp("graft_part")
    Tables.orders(spark, sf).write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("o_orderstatus") === "F")
    val scanned = back.queryExecution.executedPlan.toString()
    assert(new java.io.File(dir).list().exists(_.startsWith("o_orderstatus=")))
    assert(back.count() > 0)
    // partition filter must prune, not scan+filter
    assert(!scanned.contains("Filter (o_orderstatus"), "partition filter should be pruned at scan")
  }
}

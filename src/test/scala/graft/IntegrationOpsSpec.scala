package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, LinkCheck, TextAnalysis, Validation}

/** Synthetic-frame tests for the curation operators — exercises the
  * paths the driver data can't (broken links, label drift, rule
  * violations). */
class IntegrationOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("link check flags unresolvable ids and drifted labels") {
    val fact = Seq(
      (1L, 10L, "Alpha"), // resolves, label ok
      (2L, 11L, "WRONG"), // resolves, label drifted
      (3L, 99L, "Gamma")  // does not resolve
    ).toDF("id", "region_id", "region_label")
    val dim = Seq((10L, "Alpha"), (11L, "Beta")).toDF("rid", "rlabel")

    val out = LinkCheck.check(fact, Seq("id"), Seq(
      LinkCheck.Ref("region", "region_id", dim, "rid",
        labelCol = Some("region_label"), dimLabel = Some("rlabel"))))
      .orderBy("id").collect()

    assert(out.map(_.getAs[Boolean]("region_resolvable")).toSeq == Seq(true, true, false))
    assert(out.map(_.getAs[Boolean]("region_label_ok")).toSeq == Seq(true, false, false))
  }

  test("validation rules count violations and unique-key duplicates") {
    val df = Seq(
      (1L, "A", 5.0), (2L, "B", -1.0), (2L, "Z", 50.0), (4L, null.asInstanceOf[String], 7.0)
    ).toDF("id", "code", "score")
    val report = Validation.report(df, Seq(
      Validation.NotNull("code"),
      Validation.InRange("score", 0, 10),
      Validation.InSet("code", Seq("A", "B")),
      Validation.Unique("id"))).collect()
    val m = report.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("not_null_code") == 1)
    assert(m("range_score") == 2)
    assert(m("enum_code") == 1) // null is not counted as a set violation
    assert(m("unique_id") == 1)
  }

  test("row-level violations list failing rules per row") {
    val df = Seq((1L, "A"), (2L, "X")).toDF("id", "code")
    val v = Validation.violations(df, "id", Seq(Validation.InSet("code", Seq("A"))))
      .collect()
    assert(v.length == 1 && v.head.getLong(0) == 2)
  }

  test("curation upsert prefers new annotation over existing") {
    val orders = Tables.orders(spark, sf)
    val lineitem = Tables.lineitem(spark, sf)
    val out = Curation.curationUpsert(orders, lineitem)
    val statuses = out.groupBy("curation_status").count().collect()
      .map(r => Option(r.getString(0)).getOrElse("null") -> r.getLong(1)).toMap
    assert(statuses.contains("HasReturns"))
    // every F-status order without returns keeps its Legacy annotation
    val fNoReturns = orders.filter(col("o_orderstatus") === "F")
      .join(lineitem.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey")).distinct(),
        col("o_orderkey") === col("l_orderkey"), "left_anti").count()
    assert(statuses.getOrElse("Legacy", 0L) == fNoReturns)
  }

  test("registration dedup flags in-batch and in-store collisions") {
    val incoming = Seq((1L, "Widget"), (2L, "widget"), (3L, "Gizmo")).toDF("p_partkey", "p_name")
    val existing = Seq((9L, "GIZMO")).toDF("p_partkey", "p_name")
    val out = Curation.registrationDedup(incoming, existing).orderBy("p_partkey").collect()
    assert(out.map(_.getAs[Boolean]("dup_in_batch")).toSeq == Seq(true, true, false))
    assert(out.map(_.getAs[Boolean]("exists_in_store")).toSeq == Seq(false, false, true))
  }

  test("batch fix reports only rows a rule actually changed, and is idempotent") {
    val df = Seq(
      (1L, "4-NOT SPECIFIED", "P"),
      (2L, "1-URGENT", "O"),
      (3L, "4-NOT SPECIFIED", "F")
    ).toDF("o_orderkey", "o_orderpriority", "o_orderstatus")
    val fixes = Seq(
      "o_orderpriority" ->
        regexp_replace(col("o_orderpriority"), "^4-NOT SPECIFIED$", "4-UNSPECIFIED"),
      "o_orderstatus" -> regexp_replace(col("o_orderstatus"), "^P$", "O"))
    val rep = Curation.batchFix(df, "o_orderkey", fixes).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(rep.toSet == Set(
      (1L, "o_orderpriority", "4-NOT SPECIFIED", "4-UNSPECIFIED"),
      (1L, "o_orderstatus", "P", "O"),
      (3L, "o_orderpriority", "4-NOT SPECIFIED", "4-UNSPECIFIED")),
      s"unchanged rows must not be reported: ${rep.toSeq}")
    // applying the fixes to already-fixed data reports nothing
    val fixed = df
      .withColumn("o_orderpriority",
        regexp_replace(col("o_orderpriority"), "^4-NOT SPECIFIED$", "4-UNSPECIFIED"))
      .withColumn("o_orderstatus", regexp_replace(col("o_orderstatus"), "^P$", "O"))
    assert(Curation.batchFix(fixed, "o_orderkey", fixes).isEmpty)
  }

  test("constraint coverage separates unconstrained, stale, and covered keys") {
    val rows = Seq("""{"k": 1, "extra": true}""", """{"k": 2}""").toDF("props")
    val out = Validation.constraintCoverage(rows, "props", Seq("k", "ghost"))
      .collect().map(r => r.getAs[String]("key") -> r.getAs[String]("status")).toMap
    assert(out == Map("k" -> "constrained", "extra" -> "unconstrained",
      "ghost" -> "stale_constraint"))
  }

  test("content-metadata check flags only disagreeing rows") {
    val docs = Seq(
      (1L, "word the word the word", "en", 22L),  // all consistent
      (2L, "word the word the word", "de", 22L),  // lang mismatch
      (3L, "plain text the words", "en", 99L)     // char-count mismatch
    ).toDF("doc_id", "text", "lang", "n_chars")
    val out = TextAnalysis.contentMetadataCheck(docs).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 3L))
    val r2 = out.find(_.getLong(0) == 2L).get
    assert(!r2.getAs[Boolean]("lang_match") && r2.getAs[Boolean]("chars_match"))
    val r3 = out.find(_.getLong(0) == 3L).get
    assert(r3.getAs[Boolean]("lang_match") && !r3.getAs[Boolean]("chars_match"))
  }
}

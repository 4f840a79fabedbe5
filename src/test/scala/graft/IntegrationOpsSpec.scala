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

  test("gated rules apply only where the completeness flag holds") {
    // the reference's mandatory vs mandatory-if-complete split: ljp is
    // required only for complete entities — an incomplete entity with a
    // missing ljp passes vacuously
    val df = Seq(
      (1L, true, "x"), // complete, field present → ok
      (2L, true, null.asInstanceOf[String]), // complete, missing → violation
      (3L, false, null.asInstanceOf[String]), // incomplete, missing → vacuous pass
      (4L, false, "y")
    ).toDF("id", "is_complete", "ljp")
    val rules = Seq(
      Validation.OnlyWhen(col("is_complete"), "complete", Validation.NotNull("ljp")))
    val m = Validation.report(df, rules).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("if_complete_not_null_ljp") == 1)
    val v = Validation.violations(df, "id", rules).collect()
    assert(v.length == 1 && v.head.getLong(0) == 2L)
    // Unique cannot be row-gated — it aggregates globally
    intercept[IllegalArgumentException](
      Validation.OnlyWhen(col("is_complete"), "c", Validation.Unique("id")))
  }

  test("row-level violations list failing rules per row") {
    val df = Seq((1L, "A"), (2L, "X")).toDF("id", "code")
    val v = Validation.violations(df, "id", Seq(Validation.InSet("code", Seq("A"))))
      .collect()
    assert(v.length == 1 && v.head.getLong(0) == 2)
  }

  test("check matrix composes the shared rules with cross-table checks") {
    val orders = Seq(
      (1L, Some(10L), 500.0, "O", "1-URGENT", "1996-01-05"),   // all pass
      (2L, None, 500.0, "O", "1-URGENT", "1996-01-05"),        // null custkey
      (3L, Some(10L), 999999.0, "X", "9-BAD", "1996-01-05"),   // range+enum+regex
      (4L, Some(10L), 500.0, "O", "1-URGENT", "1996-01-05")    // no lineitems
    ).toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
      "o_orderpriority", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
    val li = Seq(
      (1L, "1996-02-01"), (2L, "1996-02-01"),
      (3L, "1995-12-31") // ships BEFORE the order date
    ).toDF("l_orderkey", "s").withColumn("l_shipdate", to_timestamp(col("s"))).drop("s")

    val rules: Seq[Validation.Rule] = Seq(
      Validation.NotNull("o_custkey"),
      Validation.InRange("o_totalprice", 0, 300000),
      Validation.InSet("o_orderstatus", Seq("O", "F")),
      Validation.Matches("o_orderpriority", "^[1-3]-[A-Z ]+$"))
    val out = Validation.checkMatrix(orders, li, rules).collect()
      .map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getAs[Boolean]("all_pass") && out(1L).getAs[Int]("n_failed") == 0)
    assert(!out(2L).getAs[Boolean]("pass_not_null_o_custkey")
      && out(2L).getAs[Int]("n_failed") == 1)
    assert(!out(3L).getAs[Boolean]("pass_range_o_totalprice")
      && !out(3L).getAs[Boolean]("pass_enum_o_orderstatus")
      && !out(3L).getAs[Boolean]("pass_regex_o_orderpriority")
      && !out(3L).getAs[Boolean]("pass_ship_after_order")
      && out(3L).getAs[Int]("n_failed") == 4)
    // no lineitems: has_lineitems and item_count fail, the ship-date
    // check is vacuously true (that failure is has_lineitems' to report)
    assert(!out(4L).getAs[Boolean]("pass_has_lineitems")
      && !out(4L).getAs[Boolean]("pass_item_count")
      && out(4L).getAs[Boolean]("pass_ship_after_order")
      && out(4L).getAs[Int]("n_failed") == 2)
    // matrix verdicts agree with the standalone q21b listing (shared rules)
    val listed = Validation.violationRows(orders, "o_orderkey", rules)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    out.values.foreach { r =>
      rules.foreach { rule =>
        assert(r.getAs[Boolean]("pass_" + rule.name) ==
          !listed.contains((r.getLong(0), rule.name)))
      }
    }
  }

  test("bundle completeness lists missing member classes per parent") {
    val parents = Seq(1L, 2L, 3L).toDF("pid")
    val members = Seq(
      (1L, "A"), (1L, "B"), (1L, "C"), (1L, "A"), // complete (dup ok)
      (2L, "B")                                    // missing A, C
      // parent 3: no members at all
    ).toDF("mid", "cls")
    val out = Validation.bundleCompleteness(parents, "pid", members, "mid",
      col("cls"), Seq("A", "B", "C")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("complete")
      && out(1L).getAs[String]("present_classes") == "A,B,C"
      && out(1L).getAs[String]("missing_classes") == "")
    assert(!out(2L).getAs[Boolean]("complete")
      && out(2L).getAs[String]("missing_classes") == "A,C"
      && out(2L).getAs[Long]("n_missing") == 2L)
    assert(!out(3L).getAs[Boolean]("complete")
      && out(3L).getAs[String]("present_classes") == ""
      && out(3L).getAs[String]("missing_classes") == "A,B,C"
      && out(3L).getAs[Long]("n_missing") == 3L)
  }

  test("bundle completeness counts on the array: comma-bearing class values don't miscount") {
    val parents = Seq(1L, 2L).toDF("pid")
    val members = Seq((1L, "X,Y")).toDF("mid", "cls") // one class whose VALUE contains a comma
    val out = Validation.bundleCompleteness(parents, "pid", members, "mid",
      col("cls"), Seq("X,Y", "Z")).collect().map(r => r.getLong(0) -> r).toMap
    // parent 1 has the comma-bearing class, missing only Z — a split on
    // the joined string would see two present classes and count wrong
    assert(out(1L).getAs[Long]("n_missing") == 1L
      && !out(1L).getAs[Boolean]("complete"))
    assert(out(2L).getAs[Long]("n_missing") == 2L)
  }

  test("type-schema pivot: fixed columns, presence counts, unschematized listing") {
    val df = Seq(
      ("b1", "en"), ("b1", "en"), ("b1", "es"),
      ("b2", "de"),
      ("b3", "zh"), ("b3", "es"), ("b3", "fr")
    ).toDF("bucket_id", "typ")
    val out = Validation.typeSchemaPivot(df, "bucket_id", "typ",
      Seq("de", "en", "es", "fr", "zh"), Seq("de", "en", "fr")).collect()
      .map(r => r.getString(0) -> r).toMap
    // fixed pivot columns: absent types count 0, never drop
    assert(out("b1").getAs[Long]("cnt_en") == 2L
      && out("b1").getAs[Long]("cnt_de") == 0L
      && out("b1").getAs[Long]("n_types") == 2L
      && out("b1").getAs[String]("unschematized_types") == "es"
      && out("b1").getAs[Long]("n_unschematized") == 1L)
    // a fully-schematized bucket reports an empty listing
    assert(out("b2").getAs[Long]("n_types") == 1L
      && out("b2").getAs[String]("unschematized_types") == ""
      && out("b2").getAs[Long]("n_unschematized") == 0L)
    // multiple unschematized types list sorted
    assert(out("b3").getAs[String]("unschematized_types") == "es,zh"
      && out("b3").getAs[Long]("n_unschematized") == 2L
      && out("b3").getAs[Long]("n_types") == 3L)
    // a type observed in NO bucket still has its column (static schema)
    assert(out("b1").schema.fieldNames.count(_.startsWith("cnt_")) == 5)
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

  test("corpus diff classifies every change type and ignores whitespace noise") {
    import spark.implicits._
    def df(rows: Seq[(Long, String, String, String)]) =
      rows.map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = df(Seq(
      (1L, "stable text here", "en", "s1"),
      (2L, "will be removed", "en", "s1"),
      (3L, "content that changes", "en", "s1"),
      (4L, "same words", "en", "s1"),        // lang flips → meta_changed
      (5L, "spaced   out", "en", "s1")))     // whitespace-only → NOT a change
    val b = df(Seq(
      (1L, "stable text here", "en", "s1"),
      (3L, "content that CHANGED completely", "en", "s1"),
      (4L, "same words", "de", "s1"),
      (5L, "spaced out", "en", "s1"),
      (6L, "brand new doc", "en", "s1")))
    val got = graft.operators.Curation.corpusDiff(a, b).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "removed", 3L -> "text_changed",
      4L -> "meta_changed", 6L -> "added"),
      s"unexpected diff: $got (1 unchanged and 5 whitespace-only must be absent)")
  }

  test("quality normalization equals the naive percent-rank window, ties included") {
    import spark.implicits._
    // source A: scores with a tie; source B: singleton (pct null)
    def doc(id: Long, src: String, alpha: String) =
      (id, alpha, "en", src, alpha.length.toLong)
    val docs = Seq(
      doc(1L, "A", "aaaa"),       // alpha_bp 10000
      doc(2L, "A", "aa..."),      // 4000
      doc(3L, "A", "aa.--"),      // 4000 (tie with 2)
      doc(4L, "A", "....."),      // 0
      doc(5L, "B", "aaa"),
      doc(6L, null.asInstanceOf[String], "aa"),  // null source = its own partition
      doc(7L, null.asInstanceOf[String], "a.")
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.operators.Corpus.qualityNormalize(docs).collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    // A has 4 docs: pct = 10000·strictly_worse/3
    assert(got(4L) == Some(0L))
    assert(got(2L) == Some(3333L) && got(3L) == Some(3333L), "ties share a rank")
    assert(got(1L) == Some(10000L))
    assert(got(5L) == None, "singleton source has no defined rank")
    // null source ranks within its own two-doc partition
    assert(got(6L) == Some(10000L) && got(7L) == Some(0L),
      "null-source docs must rank against each other, not vanish")
    // cross-check against the naive per-source window formula
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
    val naive = docs
      .withColumn("n_chars2", length(col("text")).cast("long"))
      .withColumn("n_alpha", length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("long"))
      .withColumn("alpha_bp", expr("(10000 * n_alpha) DIV nullif(n_chars2, 0)"))
      .filter(col("alpha_bp").isNotNull)
      .withColumn("r", rank().over(w.orderBy("alpha_bp")).cast("long"))
      .withColumn("pct_bp", expr("(10000 * (r - 1)) DIV nullif(COUNT(1) OVER (PARTITION BY source) - 1, 0)"))
      .select("doc_id", "pct_bp").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(got == naive)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Search

/** Lexical retrieval (q86 tf-idf terms, q87 keyword search): exact
  * integer scoring on a hand-computed corpus, AND semantics, the
  * length-normalization ordering, and the scale-shape plan pins. */
class SearchSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // N=4 docs; df: merge=1 join=2 scan=2 window=1 ""(null doc)=1
  // idf_bp(t) = (10000·(N−df+1)) DIV (df+1):
  //   merge/window/"" → 20000; join/scan → 10000
  private def corpus = Seq(
    (1L, "merge join merge"),
    (2L, "join scan"),
    (3L, "window window window scan"),
    (4L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("tfidf terms: exact integer scores, tie broken by term asc") {
    val out = Search.tfidfTerms(corpus, m = 1).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L), "every doc ranks its top term")
    // doc1: merge tf=2 → 2·20000 = 40000 beats join 10000
    assert(out(1L).getAs[String]("term") == "merge")
    assert(out(1L).getAs[Long]("tfidf_bp") == 40000L)
    assert(out(1L).getAs[Long]("tf") == 2L && out(1L).getAs[Long]("df") == 1L)
    // doc2: join and scan tie at 10000 → term asc picks "join"
    assert(out(2L).getAs[String]("term") == "join")
    assert(out(2L).getAs[Long]("tfidf_bp") == 10000L)
    // doc3: window 3·20000
    assert(out(3L).getAs[String]("term") == "window")
    assert(out(3L).getAs[Long]("tfidf_bp") == 60000L)
    // null text tokenizes to the single empty token (the oracle's
    // string_split_regex does the same — both engines agree)
    assert(out(4L).getAs[String]("term") == "")
  }

  test("tfidf terms: m bounds per-doc rows and ranks are dense from 1") {
    val out = Search.tfidfTerms(corpus, m = 2).collect()
    val byDoc = out.groupBy(_.getLong(0))
    byDoc.foreach { case (_, rows) =>
      assert(rows.length <= 2)
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq ==
        (1L to rows.length.toLong).toSeq)
    }
    // doc2 has exactly 2 terms; doc4 only 1
    assert(byDoc(2L).length == 2 && byDoc(4L).length == 1)
  }

  test("keyword search: AND semantics, exact normalized scores, shorter doc ranks first") {
    val qs = Seq(1 -> Seq("merge", "join"), 2 -> Seq("scan"))
    val out = Search.keywordSearch(corpus, qs, k = 10).collect()
    val byQ = out.groupBy(_.getInt(0))
    // query 1: only doc1 holds BOTH terms (doc2 has join but no merge)
    assert(byQ(1).map(_.getLong(2)).toSeq == Seq(1L))
    // raw = idf(merge)·tf + idf(join)·tf = 20000·2 + 10000·1
    assert(byQ(1).head.getAs[Long]("score_bp") == (10000L * 50000L) / (1500L + 3L))
    // query 2: docs 2 and 3 both contain scan with tf=1 → equal raw
    // 10000; the 2-token doc outranks the 4-token doc purely on the
    // length pivot
    assert(byQ(2).map(_.getLong(2)).toSeq == Seq(2L, 3L))
    assert(byQ(2)(0).getAs[Long]("score_bp") == (10000L * 10000L) / (1500L + 2L))
    assert(byQ(2)(1).getAs[Long]("score_bp") == (10000L * 10000L) / (1500L + 4L))
  }

  test("keyword search: a query term absent from the corpus empties that query only") {
    val qs = Seq(1 -> Seq("scan"), 2 -> Seq("scan", "nosuchterm"))
    val out = Search.keywordSearch(corpus, qs, k = 10).collect()
    assert(out.forall(_.getInt(0) == 1), "AND with df=0 term matches nothing")
    assert(out.nonEmpty)
    intercept[IllegalArgumentException] {
      Search.keywordSearch(corpus, Seq(1 -> Seq.empty[String]))
    }
  }

  test("keyword search is one corpus scan: no explode, no shuffle before the heap") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val df = Search.keywordSearch(docs)
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("SortMergeJoin"), "stats must broadcast, never shuffle-join")
    assert("TopKPerKey \\[".r.findAllIn(plan).length == 2,
      "ranking must run on the two-phase bounded heap")
    // the corpus parquet is read exactly twice: once for the 1-row
    // stats aggregate, once for the scoring scan — never per query term
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans <= 2, s"expected ≤2 corpus scans, got $scans:\n${plan.take(2000)}")
  }

  test("tfidf terms: df/N stats ride broadcasts; corpus shuffles once on (doc, term)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Search.tfidfTerms(docs).queryExecution.executedPlan.toString()
    assert(!plan.contains("SortMergeJoin"),
      "df join must broadcast the vocabulary-bounded side")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Larger-SF stress of the iterative operators: invariant checks at
  * sf0.1 (the largest local testdata), where the duplicate-component
  * structure is richer than the unit fixtures. These are the
  * oracle-free guards: properties that must hold for ANY corpus, so
  * they keep holding at scales where no oracle can be computed.
  */
class StressSpec extends AnyFunSuite {
  import TestSpark._

  test("near-dup clusters at sf0.1 satisfy the component invariants") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val out = Dedup.nearDupClusters(docs).cache()
    try {
      assert(out.count() == docs.count(), "every doc labeled exactly once")
      // every candidate edge's endpoints agree on the cluster — the
      // defining connected-component property the fixpoint guarantees
      val lab = out.select(col("doc_id"), col("cluster_id"))
      val split = Dedup.minhashCandidatePairs(docs)
        .join(lab.select(col("doc_id").as("doc_a"), col("cluster_id").as("ca")), Seq("doc_a"))
        .join(lab.select(col("doc_id").as("doc_b"), col("cluster_id").as("cb")), Seq("doc_b"))
        .filter(col("ca") =!= col("cb"))
      assert(split.isEmpty, "no candidate edge may straddle two clusters")
      // each cluster is named by its minimum member, which is the one
      // self-labeled canonical
      val bad = out.groupBy("cluster_id")
        .agg(min(col("doc_id")).as("min_id"),
          sum(when(col("is_canonical"), 1L).otherwise(0L)).as("n_canon"))
        .filter(col("min_id") =!= col("cluster_id") || col("n_canon") =!= 1L)
      assert(bad.isEmpty, "cluster id = min member with exactly one canonical")
    } finally out.unpersist()
  }

  test("decontamination at sf0.1 covers the corpus split exactly once") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val out = Dedup.decontaminate(docs)
    val nBench = docs.filter(
      col("doc_id") % Dedup.BenchmarkMod === 0 && col("doc_id") < Dedup.BenchmarkMaxId).count()
    assert(out.count() == docs.count() - nBench,
      "one verdict row per corpus (non-benchmark) doc")
    // contamination shares are well-formed
    assert(out.filter(col("contam_bp") < 0 || col("contam_bp") > 10000).isEmpty)
    assert(out.filter(col("is_contaminated") =!= (col("n_shared") > 0)).isEmpty)
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** RECALL evidence for the approximate retrieval family (r13 verdict
  * item 2): the ANN family's recall is audited by inventory operators
  * (q110/q110b); q103b's champion-list pruning had only a
  * deterministically spec-pinned trade with no measured number. This
  * main runs [[graft.operators.Corpus.retrievalRecallAudit]] — the
  * pruned retrieval vs the exhaustive rescore over the SAME query set
  * and scoring space — at each given SF dir and prints ONE JSON line
  * with the per-SF macro-mean / min / pooled recall@k, so the trade is
  * a MEASUREMENT an audit can cite (RECALL_rNN.json). */
object BenchRecall {
  def main(args: Array[String]): Unit = {
    val dirs = sys.env.getOrElse("SPARK_GRAFT_RECALL_DIRS",
      "/root/testdata/sf0.01,/root/testdata/sf0.1").split(',').map(_.trim).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val k = sys.env.getOrElse("SPARK_GRAFT_RECALL_K", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = dirs.map { dir =>
      val docs = Tables.documents(spark, dir)
      val a = graft.operators.Corpus.retrievalRecallAudit(docs, k).collect()
      val n = a.length.max(1)
      val macroMean = a.map(_.getAs[Long]("recall_bp")).sum / n
      val minBp = if (a.isEmpty) -1L else a.map(_.getAs[Long]("recall_bp")).min
      val pooled = {
        val hits = a.map(_.getAs[Long]("n_hits")).sum
        val exact = a.map(_.getAs[Long]("n_exact")).sum.max(1L)
        10000L * hits / exact
      }
      val nConf = a.map(_.getAs[Long]("n_confident")).sum
      val nConfHit = a.map(_.getAs[Long]("n_confident_hits")).sum
      val confBp = 10000L * nConfHit / nConf.max(1L)
      s""""$dir":{"n_queries":${a.length},"macro_mean_bp":$macroMean,""" +
        s""""min_bp":$minBp,"micro_bp":$pooled,""" +
        s""""n_confident":$nConf,"n_confident_hits":$nConfHit,""" +
        s""""confident_bp":$confBp}"""
    }
    println(s"""{"metric":"retrieval_recall_at_$k","unit":"bp",""" +
      s""""confident_bar_q20":${graft.operators.Corpus.ConfidentSimQ20},""" +
      s""""note":"q103b champion-list pruning vs exhaustive rescore, same query set and scoring space; confident = exhaustive top-k rows at cos2 >= bar/2^20 (the near-dup band; the unrestricted top-k is a noise ranking in the saturated 64-bucket hashed space)",""" +
      s""""dirs":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}

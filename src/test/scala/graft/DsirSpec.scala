package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dsir

/** q101/q101b — DSIR importance reweighting + resampling. The log2mb
  * kernel's exactness is pinned in LmScreenSpec; here the kernel is
  * trusted as a primitive and the spec independently re-derives every
  * OTHER moving part — token hashing, bucket counts, the smoothing
  * domain, the per-doc weight aggregation and the exponential-race
  * election — in plain Scala, then checks the operators reproduce it.
  */
class DsirSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]): DataFrame =
    rows.map { case (id, t) => (id, t, if (id % 2 == 0) "en" else "fr", "s0",
      Option(t).map(_.length.toLong).getOrElse(0L)) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  /** independent Scala md5-60: first 15 hex chars of the md5 digest —
    * must agree with Dedup.md5_60 / the oracle's substr(md5(s),1,15). */
  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def tokens(text: String): Seq[String] =
    Option(text).getOrElse("").toLowerCase.trim.split(" +", -1).toSeq

  private def bucket(t: String): Long = md5_60(Dsir.FeatPrefix + t) % Dsir.Buckets

  /** kernel-as-primitive: evaluate log2mb on literal pairs. */
  private def mb(pairs: Seq[(Long, Long)]): Map[(Long, Long), Long] = {
    val df = pairs.distinct.toDF("a", "b")
    df.withColumn("mb", graft.functions.LogExpressions.log2mb(col("a"), col("b")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  /** full independent replay of the q101 weight computation over a
    * collected corpus (kernel calls aside, no Spark operators). */
  private def expectedWeights(rows: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    val B = Dsir.Buckets
    val toks = rows.flatMap { case (id, t) => tokens(t).map(tok => (id, bucket(tok))) }
    val rf = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tf = toks.filter(_._1 % Dsir.TargetMod == 0)
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val rtot = rf.values.sum; val ttot = tf.values.sum
    val pairs = (0L until B.toLong).flatMap { f =>
      Seq((rf.getOrElse(f, 0L) + 1, rtot + B), (tf.getOrElse(f, 0L) + 1, ttot + B))
    }
    val k = mb(pairs)
    val delta = (0L until B.toLong).map { f =>
      f -> (k((rf.getOrElse(f, 0L) + 1, rtot + B)) - k((tf.getOrElse(f, 0L) + 1, ttot + B)))
    }.toMap
    rows.map { case (id, t) =>
      val tk = tokens(t)
      id -> (tk.size.toLong, tk.map(tok => delta(bucket(tok))).sum)
    }.toMap
  }

  test("weights: Spark output equals the independent Scala replay") {
    val rows = Seq[(Long, String)](
      (0L, "alpha beta alpha gamma"), // target doc (id % 5 == 0)
      (1L, "alpha beta"),
      (2L, "delta delta delta epsilon zeta"),
      (3L, ""), // empty text → ONE empty token
      (5L, "gamma gamma alpha"), // target doc
      (7L, "Alpha  BETA gamma"), // canonicalization: case + runs of spaces
      (10L, "zeta zeta zeta zeta"), // target doc
      (11L, null) // null text → one empty token
    )
    val got = Dsir.dsirWeights(docs(rows)).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_tokens"), r.getAs[Long]("weight_mb"),
        r.getAs[Boolean]("keep"))).toMap
    val want = expectedWeights(rows)
    assert(got.keySet == rows.map(_._1).toSet, "every document surfaces")
    rows.map(_._1).foreach { id =>
      val (nt, w) = want(id)
      assert(got(id) == ((nt, w, w > 0)), s"doc $id")
    }
  }

  test("model is exactly Buckets rows covering the full domain") {
    val m = Dsir.dsirModel(docs(Seq((0L, "a b c"), (1L, "d e"))))
    assert(m.delta.size == Dsir.Buckets)
    assert(m.delta.keySet == (0L until Dsir.Buckets.toLong).toSet)
  }

  test("hashing trick: a wide vocabulary still yields a Buckets-sized model") {
    // 2000 distinct tokens — the model frame must stay at exactly B rows
    val wide = docs(Seq((0L, (0 until 1000).map(i => s"tok$i").mkString(" ")),
      (1L, (1000 until 2000).map(i => s"tok$i").mkString(" "))))
    assert(Dsir.dsirModel(wide).delta.size == Dsir.Buckets)
  }

  test("resample: exponential-race winners match the independent election") {
    val corpus = Tables.documents(spark, sf)
    val rows = corpus.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val w = expectedWeights(rows)
    val keepers = rows.map(_._1).filter(id => w(id)._2 > 0)
    val mbu = mb(keepers.map(id =>
      (md5_60(Dsir.RacePrefix + id.toString) + 1, Dsir.HashRange)))
    val keyed = keepers.map { id =>
      val u = mbu((md5_60(Dsir.RacePrefix + id.toString) + 1, Dsir.HashRange))
      id -> (u * Dsir.RaceScale / w(id)._2)
    }
    val want = keyed.sortBy { case (id, k) => (k, id) }.take(Dsir.SampleK).toMap
    val got = Dsir.dsirResample(corpus).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("weight_mb"), r.getAs[Long]("race_mb"))).toMap
    assert(got.keySet == want.keySet, "same winner set")
    got.foreach { case (id, (wt, race)) =>
      assert(wt == w(id)._2 && race == want(id), s"doc $id key")
    }
    assert(got.size == math.min(Dsir.SampleK, keepers.size),
      "budget: K winners, or every keeper when fewer race")
  }

  test("resample from a persisted weights frame equals the end-to-end draw") {
    val corpus = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_dsirw").toString
    Dsir.dsirWeights(corpus).write.mode("overwrite").parquet(dir)
    val fromFrame = Dsir.resampleFromWeights(spark.read.parquet(dir))
      .collect().map(_.toSeq).toSet
    val endToEnd = Dsir.dsirResample(corpus).collect().map(_.toSeq).toSet
    assert(fromFrame == endToEnd,
      "a persisted q101 output must support the identical draw")
  }

  test("keep fence genuinely partitions the real corpus") {
    val out = Dsir.dsirWeights(Tables.documents(spark, sf))
      .groupBy("keep").count().collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(out.getOrElse(true, 0L) > 0 && out.getOrElse(false, 0L) > 0,
      s"both classes non-empty, got $out")
  }

  test("empty corpus: weights empty, resample empty, model all-zero") {
    val empty = docs(Nil)
    assert(Dsir.dsirWeights(empty).count() == 0)
    assert(Dsir.dsirResample(empty).count() == 0)
    // with no tokens on either side, both smoothed models are uniform
    // and every delta is log2mb(1,B) - log2mb(1,B) = 0
    assert(Dsir.dsirModel(empty).delta.values.forall(_ == 0L))
  }

  test("frozen-model stream scoring reproduces the batch weights verbatim") {
    val corpus = Tables.documents(spark, sf)
    val model = Dsir.dsirModel(corpus)
    val want = Dsir.dsirWeights(corpus).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_tokens"), r.getAs[Long]("weight_mb"),
        r.getAs[Boolean]("keep"))).toMap
    val got = graft.streaming.DocStreams.dsirLookup(corpus, model).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_tokens"), r.getAs[Long]("weight_mb"),
        r.getAs[Boolean]("keep"))).toMap
    assert(got == want, "row-local lookup must equal the batch screen")
  }
}

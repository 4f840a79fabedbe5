package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

/** The driver-side Lloyd refinements (`Similarity.lloydStepLocal` /
  * `lloydIterAllLocal`) must be BIT-IDENTICAL to the distributed form
  * they replaced — every PQ/IVF oracle replays that arithmetic, so a
  * single flipped ulp would hash-fail seven inventory queries. This
  * spec keeps the distributed computation alive as the ground truth
  * (rebuilt from the same public building blocks the encode/search
  * paths still use) and compares exactly:
  *   - on the real sf0.001 embeddings through the public
  *     ivfCentroids/pqCodebooks entry points, and
  *   - on synthetic edge rows exercising the replication hazards:
  *     negative components at exact .5 scaled-rounding boundaries
  *     (HALF_UP vs floor(x+.5) divergence), assignment ties
  *     (duplicate centroids), NaN scores (zero-norm vector), ragged
  *     short rows, and cells that lose every member.
  */
class LloydEquivalenceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // ---- the distributed Lloyd iterations exactly as previously shipped

  private def lloydStepSpark(e: DataFrame, centroids: Seq[Seq[Double]]): Seq[Seq[Double]] = {
    val withDots = e.withColumn("__dots",
      graft.functions.VectorExpressions.vec_cell_dots(col("embedding"), centroids))
    val scores = centroids.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      struct((element_at(col("__dots"), i + 1) / (col("norm") * cn)).as("score"),
        lit(i).as("cell"))
    }
    val means = withDots
      .withColumn("cell",
        (if (scores.size == 1) scores.head else greatest(scores: _*)).getField("cell"))
      .select(col("cell"), posexplode(col("embedding")))
      .groupBy(col("cell"), col("pos"))
      .agg(expr("SUM(CAST(round(col * 1000000) AS BIGINT)) DIV COUNT(*)").as("m_scaled"))
      .collect()
      .groupBy(_.getAs[Int]("cell"))
    centroids.zipWithIndex.map { case (old, i) =>
      means.get(i)
        .map(_.sortBy(_.getAs[Int]("pos")).map(_.getAs[Long]("m_scaled") / 1e6).toSeq)
        .getOrElse(old)
    }
  }

  private def lloydIterAllSpark(sample: DataFrame, books: Seq[Seq[Seq[Double]]],
                                m: Int, d: Int): Seq[Seq[Seq[Double]]] = {
    val parts = (0 until m).map { mi =>
      val sub = sample.select(slice(col("embedding"), mi * d + 1, d).as("embedding"))
        .withColumn("__pqdots",
          graft.functions.VectorExpressions.vec_cell_dots(col("embedding"), books(mi)))
      val scores = books(mi).toIndexedSeq.zipWithIndex.map { case (c, i) =>
        val cn2 = c.map(x => x * x).sum
        struct((lit(cn2) - lit(2.0) * element_at(col("__pqdots"), i + 1)).as("d2"),
          lit(i).as("code"))
      }
      sub.withColumn("code",
          (if (scores.size == 1) scores.head else least(scores: _*)).getField("code"))
        .select(lit(mi).as("mi"), col("code"), posexplode(col("embedding")))
    }
    val byCell = parts.reduce(_.unionByName(_))
      .groupBy("mi", "code", "pos")
      .agg(expr("SUM(CAST(round(col * 1000000) AS BIGINT)) DIV COUNT(*)").as("m_scaled"))
      .collect()
      .groupBy(r => (r.getAs[Int]("mi"), r.getAs[Int]("code")))
    (0 until m).map { mi =>
      books(mi).zipWithIndex.map { case (old, ci) =>
        byCell.get((mi, ci))
          .map(_.sortBy(_.getAs[Int]("pos")).map(_.getAs[Long]("m_scaled") / 1e6).toSeq)
          .getOrElse(old)
      }
    }
  }

  /** bit-strict comparison: 0.0 vs -0.0 or a NaN payload change is a
    * model drift the hash oracle WOULD see. */
  private def assertBitEqual(a: Seq[Seq[Double]], b: Seq[Seq[Double]], tag: String): Unit = {
    assert(a.size == b.size, s"$tag: shape ${a.size} vs ${b.size}")
    a.zip(b).zipWithIndex.foreach { case ((ra, rb), i) =>
      assert(ra.size == rb.size, s"$tag row $i: ${ra.size} vs ${rb.size}")
      ra.zip(rb).zipWithIndex.foreach { case ((x, y), j) =>
        assert(java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y),
          s"$tag [$i][$j]: $x vs $y")
      }
    }
  }

  private def collectIvfRows(e: DataFrame): Array[(Array[Double], Double)] =
    Similarity.withNorm(e).select(col("embedding"), col("norm")).collect()
      .map(r => (r.getSeq[Number](0).map(_.doubleValue()).toArray, r.getDouble(1)))

  private def collectPqRows(e: DataFrame): Array[Array[Double]] =
    e.select(col("embedding")).collect()
      .map(_.getSeq[Number](0).map(_.doubleValue()).toArray)

  test("public ivfCentroids output is unchanged vs the distributed pipeline on sf0.001") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val got = Similarity.ivfCentroids(e, nCells = 16)
    // the previously-shipped pipeline: hash-ordered sample, seed = first
    // nCells, two distributed Lloyd steps over the sample frame
    val sample = Similarity.withNorm(e)
      .select(col("vec_id"), col("embedding"), col("norm"),
        Dedup.md5_60(concat(lit("ivf:"), col("vec_id").cast("string"))).as("__h"))
      .orderBy(col("__h"), col("vec_id"))
      .limit(4096)
      .cache()
    val seed = sample.limit(16).select(col("embedding")).collect()
      .map(_.getSeq[Number](0).map(_.doubleValue()).toSeq).toSeq
    val want = (1 to 2).foldLeft(seed)((c, _) => lloydStepSpark(sample, c))
    sample.unpersist()
    assertBitEqual(got, want, "ivfCentroids sf0.001")
  }

  test("public pqCodebooks output is unchanged vs the distributed pipeline on sf0.001") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (m, dim, k) = (8, 64, 16)
    val d = dim / m
    val got = Similarity.pqCodebooks(e, m, dim, k)
    val sample = e
      .select(col("vec_id"), col("embedding"),
        Dedup.md5_60(concat(lit("pq:"), col("vec_id").cast("string"))).as("__h"))
      .orderBy(col("__h"), col("vec_id"))
      .limit(4096)
      .cache()
    val seedRows = sample.limit(k).select(col("embedding"))
      .collect().map(_.getSeq[Number](0).map(_.doubleValue()).toIndexedSeq).toSeq
    val seeds: Seq[Seq[Seq[Double]]] = (0 until m).map { mi =>
      seedRows.map(v => v.slice(mi * d, mi * d + d).toSeq): Seq[Seq[Double]]
    }
    val want = (1 to 2).foldLeft(seeds)((b, _) => lloydIterAllSpark(sample, b, m, d))
    sample.unpersist()
    got.zip(want).zipWithIndex.foreach { case ((g, w), mi) =>
      assertBitEqual(g, w, s"pqCodebooks sf0.001 subspace $mi")
    }
  }

  test("IVF step: rounding boundaries, duplicate-centroid ties, short rows, emptied cells") {
    // doubles (the q81 residual-frame element type) chosen so x*1e6
    // lands EXACTLY on .5 — where HALF_UP (away from zero: -1.5 → -2)
    // and floor(x+0.5) (-1.5 → -1) disagree; the test asserts the
    // boundary is actually hit so the case can't silently evaporate
    val halves = Seq(1.5e-6, -1.5e-6, 2.5e-6, -2.5e-6, 0.5e-6, -0.5e-6)
    halves.foreach(v => assert((v * 1e6) % 1.0 == 0.5 || (v * 1e6) % 1.0 == -0.5,
      s"precondition: $v*1e6 must land on .5, got ${v * 1e6}"))
    val rows = Seq(
      Tuple1(Seq(1.5e-6, -1.5e-6, 2.5e-6, -2.5e-6)),
      Tuple1(Seq(-0.5e-6, 0.5e-6, -1.0, 1.0)),
      // NB: zero-norm and NaN vectors are OUTSIDE the equivalence
      // contract — ANSI mode makes the distributed form fail loud on
      // both (double division by exact zero; CAST(NaN AS BIGINT)), so
      // the whole IVF family rejects them and no bit pattern exists to
      // match. NaN-score assignment is therefore unreachable; the
      // local Double.compare ordering still mirrors Spark's
      // NaN-ranks-greatest for safety.
      Tuple1(Seq(3.0, -2.0, 1.0, -4.0)),
      Tuple1(Seq(3.0, -2.0)) // ragged short row
    ).toDF("embedding")
    val cents = Seq(
      Seq(1.0, 0.0, 0.0, 0.0),
      Seq(1.0, 0.0, 0.0, 0.0), // duplicate → score tie on every row
      Seq(-1.0, 1.0, -1.0, 1.0),
      Seq(9.0, 9.0, 9.0, 9.0)) // expected to lose all members → kept
    val e = Similarity.withNorm(rows)
    val want = lloydStepSpark(e, cents)
    val got = Similarity.lloydStepLocal(collectIvfRows(rows), cents)
    assertBitEqual(got, want, "ivf edge rows")
    // second iteration from the refined model (exercises non-literal centroids)
    assertBitEqual(
      Similarity.lloydStepLocal(collectIvfRows(rows), got),
      lloydStepSpark(e, want), "ivf edge rows, iter 2")
  }

  test("PQ step: d2 ties take the smaller code; short rows; emptied codes keep old") {
    val rows = Seq(
      Tuple1(Seq(1.5e-6, -1.5e-6, 1.0, -1.0)),
      Tuple1(Seq(0.0, 0.0, 0.0, 0.0)),
      Tuple1(Seq(-2.5e-6, 0.5e-6, 2.0, 3.0)),
      Tuple1(Seq(1.0, 2.0)) // short row: subspace 1 sees an empty slice
    ).toDF("embedding")
    val (m, d) = (2, 2)
    val books: Seq[Seq[Seq[Double]]] = Seq(
      Seq(Seq(0.0, 0.0), Seq(0.0, 0.0), Seq(5.0, 5.0)), // duplicate codes → tie
      Seq(Seq(1.0, -1.0), Seq(-1.0, 1.0), Seq(9.0, 9.0)))
    val want = lloydIterAllSpark(rows, books, m, d)
    val got = Similarity.lloydIterAllLocal(collectPqRows(rows), books, m, d)
    got.zip(want).zipWithIndex.foreach { case ((g, w), mi) =>
      assertBitEqual(g, w, s"pq edge rows subspace $mi")
    }
  }
}

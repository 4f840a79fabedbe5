package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity over an embedding column (SURVEY.md §2C):
  * embedding-cosine near-dup pairs, brute-force cosine top-k, and a
  * random-hyperplane-LSH bucketed variant (the 100 TB path: equality
  * join on bucket id instead of a cartesian product).
  *
  * Dot products use zip_with + aggregate over the array column —
  * builtin higher-order functions, evaluated row-local. Vectors are
  * L2-normalized once up front so every pair comparison is a plain dot
  * product.
  */
object Similarity {

  /** codegen'd dot product (custom Catalyst expression, float-native —
    * the HOF zip_with/aggregate form evaluates interpreted and is ~10×
    * slower on the all-pairs hot path). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.vec_dot(a, b)

  /** embeddings + scalar L2 norm. cosine(a,b) = dot(a,b)/(‖a‖·‖b‖) —
    * carrying a norm scalar instead of materializing normalized copies
    * of every vector keeps the pair stage free of array allocations. */
  def withNorm(embeddings: DataFrame): DataFrame =
    embeddings.withColumn("norm",
      sqrt(graft.functions.VectorExpressions.vec_norm_sq(col("embedding"))))

  /** q34: top-N most-similar embedding pairs (near-dup screen).
    * All-pairs is acceptable at validation scale; the LSH variant below
    * is the production path — same output schema. */
  def nearDupPairs(embeddings: DataFrame, topN: Int = 100): DataFrame = {
    val e = withNorm(embeddings).select(col("vec_id"), col("embedding"), col("norm"))
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("e_a"), col("norm").as("n_a"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("e_b"), col("norm").as("n_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("e_a"), col("e_b")) / (col("n_a") * col("n_b"))).as("cosine"))
      .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
      .limit(topN)
  }

  /** rank the ≤k survivors of the custom TopKPerKey operator — the
    * bounded-heap physical plan replaces a full per-key sort of every
    * candidate (see graft.plans.TopKPerKey); the residual window only
    * ever sees k rows per query. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val top = graft.plans.TopKPerKey(scored,
      Seq(col("query_id")), Seq(col("cosine").desc, col("neighbor_id")), k)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    top.withColumn("rank", row_number().over(w)).orderBy("query_id", "rank")
  }

  /** q35: brute-force cosine top-k neighbors for a query set — the
    * exact baseline the ANN variants are judged against. */
  def knnBruteForce(embeddings: DataFrame, nQueries: Int = 20, k: Int = 10): DataFrame = {
    val e = withNorm(embeddings).select(col("vec_id"), col("embedding"), col("norm"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("e_q"), col("norm").as("n_q"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("e_c"), col("norm").as("n_c"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("e_q"), col("e_c")) / (col("n_q") * col("n_c"))).as("cosine"))
    rankTopK(scored, k)
  }

  /** deterministic random hyperplanes (seeded) as array literals. */
  private def planes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** sign-bucket id from nPlanes hyperplane sides (sign of the raw dot
    * product — normalization can't flip a sign, so no norm needed). */
  def lshBucket(embedding: Column, nPlanes: Int, dim: Int): Column =
    planes(nPlanes, dim).zipWithIndex.map { case (p, j) =>
      when(dot(embedding, typedLit(p)) > 0, 1 << j).otherwise(0)
    }.reduce(_ + _)

  /** IVF coarse quantizer: deterministic centroid sample (every
    * (n/C)-th vector by id — a k-means refinement would slot in here),
    * cell assignment by nearest centroid. Returns (cells frame with
    * `cell` column, centroids indexed). Centroids are driver-side by
    * design: C×dim doubles is a legitimate broadcast-sized model, the
    * standard IVF shape. */
  def ivfAssign(embeddings: DataFrame, nCells: Int): DataFrame = {
    val e = withNorm(embeddings)
    val n = e.count()
    val step = math.max(n / nCells, 1L)
    val centroids = e.filter(pmod(col("vec_id"), lit(step)) === 0)
      .limit(nCells)
      .select(col("embedding"))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq)
    // nearest centroid by cosine = argmax dot/norm (centroid norm is a
    // per-cell constant factor — divide it out)
    val cellScores = centroids.zipWithIndex.map { case (c, i) =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      struct((dot(col("embedding"), typedLit(c)) / (col("norm") * cn)).as("score"),
        lit(i).as("cell"))
    }
    e.withColumn("cell", greatest(cellScores: _*).getField("cell"))
  }

  /** q36b-style ANN via IVF: queries probe their own cell only
    * (nprobe=1; widen by unioning per-cell assignments for higher
    * recall). Candidates come from an equality join on the cell id —
    * same scale shape as the LSH variant. */
  def knnIvf(embeddings: DataFrame, nCells: Int = 16,
             nQueries: Int = 20, k: Int = 10): DataFrame = {
    val e = ivfAssign(embeddings, nCells)
      .select(col("vec_id"), col("embedding"), col("norm"), col("cell"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("e_q"),
        col("norm").as("n_q"), col("cell"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("e_c"),
      col("norm").as("n_c"), col("cell"))
    val scored = q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("e_q"), col("e_c")) / (col("n_q") * col("n_c"))).as("cosine"))
    rankTopK(scored, k)
  }

  /** q36: ANN top-k via random-hyperplane LSH — candidates come from an
    * equality join on the bucket id (shuffle on a small int key; at
    * 100 TB this replaces the quadratic cross join; recall traded for
    * the multi-probe/plane-count knobs). */
  def knnLsh(embeddings: DataFrame, nPlanes: Int = 8, dim: Int = 64,
             nQueries: Int = 20, k: Int = 10): DataFrame = {
    val e = withNorm(embeddings)
      .select(col("vec_id"), col("embedding"), col("norm"))
      .withColumn("bucket", lshBucket(col("embedding"), nPlanes, dim))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("e_q"),
        col("norm").as("n_q"), col("bucket"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("e_c"),
      col("norm").as("n_c"), col("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("e_q"), col("e_c")) / (col("n_q") * col("n_c"))).as("cosine"))
    rankTopK(scored, k)
  }
}

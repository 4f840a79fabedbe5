package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Morphology
import graft.operators.Morphology._

/** Byte-level spec for the q79 morphology tree-walk kernel: the parser
  * and walk are exercised on HAND-WRITTEN SWC content (independent of
  * the fixture), on header variants, on malformed trees, and on the
  * radical-diameter boundary; then the fixture sweep proves
  * parse∘synth equals the closed form the DuckDB oracle replays. */
class MorphologySpec extends AnyFunSuite {

  private def swc(lines: String*): Array[Byte] =
    lines.mkString("", "\n", "\n").getBytes("US-ASCII")

  // a hand-built tree, nothing to do with synthSwc: one stem section of
  // two points, a fork (sections 4 and 5), and a type-changing
  // unifurcation with a radius spike below section 5
  private val handTree = Seq(
    "# hand-written morphology",
    "# n type x y z radius parent",
    "1 1 0 0 0 10 -1",
    "2 2 0 0 2 5 1",
    "3 2 0 0 4 5 2",
    "4 2 1 0 4 5 3",
    "5 2 0 3 4 5 3",
    "6 3 0 3 6 50 5")

  test("tree walk on hand-written SWC: sections, orders, screens") {
    val m = treeMetrics(7L, parseSwc(swc(handTree: _*)))
    assert(m.morph_id == 7L)
    assert(m.n_neurites == 1, "one stem off the soma")
    assert(m.n_points == 6)
    assert(m.n_sections == 4,
      "breaks at soma child, two fork children, and the type change")
    assert(m.max_branch_order == 2,
      "stem=0, fork children=1, type-change section=2")
    assert(m.total_len_um == 10, "2+2+1+3+2 exact axis-aligned lengths")
    assert(m.n_radical == 1, "only the 5->50 jump over 2 um is radical")
    assert(m.n_single_child == 1, "node 5's section has exactly one child section")
    assert(m.n_multifurc == 0)
    assert(m.n_hetero_neurites == 1, "the stem mixes types 2 and 3")
  }

  test("header discipline: synonym 'r' and permuted column order parse identically") {
    val canonical = parseSwc(swc(handTree: _*))
    // same rows, 'r' for 'radius'
    val syn = handTree.updated(1, "# n type x y z r parent")
    assert(parseSwc(swc(syn: _*)) == canonical)
    // radius moved before the coordinates — rows rewritten to match
    val permutedRows = canonical.map(n =>
      s"${n.id} ${n.typ} ${n.radius.toLong} ${n.x.toLong} ${n.y.toLong} ${n.z.toLong} ${n.parent}")
    val permuted = swc((Seq("# hand-written morphology",
      "# n type radius x y z parent") ++ permutedRows): _*)
    assert(parseSwc(permuted) == canonical,
      "the header dictates field order; a permuted layout must parse to the same nodes")
    // no recognizable column line anywhere -> fail loud
    intercept[IllegalArgumentException] {
      parseSwc(swc(("# just a comment" +: handTree.drop(2)): _*))
    }
    // junk field -> IllegalArgumentException, not NumberFormatException
    intercept[IllegalArgumentException] {
      parseSwc(swc(handTree.updated(3, "2 2 abc 0 2 5 1"): _*))
    }
  }

  test("malformed trees fail loud: duplicate ids, multiple roots, dangling parent, orphan cycle") {
    intercept[IllegalArgumentException] {
      treeMetrics(1L, parseSwc(swc(handTree :+ "6 3 9 9 9 5 5": _*)))
    }
    intercept[IllegalArgumentException] { // second parentless root
      treeMetrics(1L, parseSwc(swc(handTree :+ "7 2 9 9 9 5 -1": _*)))
    }
    intercept[IllegalArgumentException] { // parent that does not exist
      treeMetrics(1L, parseSwc(swc(handTree :+ "7 2 9 9 9 5 99": _*)))
    }
    intercept[IllegalArgumentException] { // 7<->8 cycle unreachable from soma
      treeMetrics(1L, parseSwc(swc(handTree ++ Seq("7 2 9 9 9 5 8", "8 2 9 9 8 5 7"): _*)))
    }
  }

  test("radical screen is exact at the boundary: strict inequality in squared-integer form") {
    // |dr|/(r0+r1)/len vs 10% per um: radii 5->15 give ratio 0.5/len,
    // so len 5 is EXACTLY at threshold (not radical), len 4 is above
    def tree(len: Long) = swc(
      "# n type x y z radius parent",
      "1 1 0 0 0 10 -1",
      "2 2 0 0 9 5 1",
      s"3 2 0 0 ${9 + len} 15 2")
    assert(treeMetrics(1L, parseSwc(tree(5))).n_radical == 0,
      "exactly at threshold must NOT flag (strict >, matching the oracle)")
    assert(treeMetrics(1L, parseSwc(tree(4))).n_radical == 1)
    // zero-length segment with a radius change: infinite change per um
    val zero = swc(
      "# n type x y z radius parent",
      "1 1 0 0 0 10 -1",
      "2 2 0 0 3 5 1",
      "3 2 0 0 3 6 2")
    assert(treeMetrics(1L, parseSwc(zero)).n_radical == 1)
  }

  /** independent replay of the fixture's node/parent closed form — the
    * same formulas the DuckDB oracle uses (SparkEntry.morphMetricsSql),
    * kept in sync by this spec. */
  private def oracleNodes(id: Long): Seq[(Long, Long)] = {
    val tc = (1 + id % 3).toInt; val d = (1 + id % 4).toInt; val sp = (2 + id % 5).toInt
    val secs = (1 << (d + 1)) - 1
    val reg = for (t <- 0 until tc; s <- 0 until secs; k <- 0 until sp) yield {
      val i = 2L + t.toLong * secs * sp + s.toLong * sp + k
      val par = if (k > 0) i - 1
        else if (s == 0) 1L
        else 2L + t.toLong * secs * sp + ((s - 1) / 2).toLong * sp + sp - 1
      (i, par)
    }
    val e7 = if (id % 7 == 0) (0 until sp).map { k =>
      val i = 2L + tc.toLong * secs * sp + k
      (i, if (k > 0) i - 1 else 1L + secs.toLong * sp)
    } else Nil
    val base = 2L + tc.toLong * secs * sp + (if (id % 7 == 0) sp else 0)
    val e11 = if (id % 11 == 0) (0 until sp).map { k =>
      (base + k, if (k > 0) base + k - 1 else sp + 1L)
    } else Nil
    reg ++ e7 ++ e11
  }

  test("fixture sweep: parse(synthSwc(id)) matches the oracle's closed form for arbitrary ids") {
    val rnd = new scala.util.Random(13)
    // 0 hits every defect path at once (0%5=0%7=0%11=0); 77 hits 7&11;
    // 35 hits 5&7; then a random sweep
    val ids = Seq(0L, 5L, 7L, 11L, 35L, 77L, 385L) ++
      Seq.fill(60)(math.abs(rnd.nextLong()) % 100000L)
    ids.foreach { id =>
      val m = treeMetrics(id, parseSwc(synthSwc(id)))
      val tc = 1 + id % 3; val d = 1 + id % 4; val sp = 2 + id % 5
      val secs = (1L << (d + 1)) - 1
      val e7 = if (id % 7 == 0) 1L else 0L
      val e11 = if (id % 11 == 0) 1L else 0L
      val nodes = oracleNodes(id)
      assert(m.n_neurites == tc, s"id=$id")
      assert(m.n_points == 1 + (tc * secs + e7 + e11) * sp, s"id=$id")
      assert(m.n_sections == tc * secs + e7 + e11, s"id=$id")
      assert(m.max_branch_order == d + e7, s"id=$id")
      assert(m.total_len_um == nodes.map { case (i, _) => 1 + (i % 3) }.sum, s"id=$id")
      assert(m.n_radical == nodes.count { case (i, par) =>
        par != 1L && ((i % 13 == 0) != (par % 13 == 0)) }, s"id=$id")
      assert(m.n_single_child == e7, s"id=$id")
      assert(m.n_multifurc == e11, s"id=$id")
      assert(m.n_hetero_neurites == (if (id % 5 == 0 || id % 7 == 0) 1L else 0L), s"id=$id")
    }
  }

  test("spark end-to-end: distributed walk equals the driver-side walk") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = spark.range(1, 61).select($"id".as("doc_id"))
    val got = Morphology.morphMetrics(docs).as[MorphMetrics].collect().toSeq
    val want = (1L until 61L).map(id => treeMetrics(id, parseSwc(synthSwc(id))))
    assert(got == want)
  }

  // ------------------------- q98/q98b: section-leaf-region attribution

  test("attribution kernels are conservative over the q79 walk (shared decomposition)") {
    import graft.operators.NeuriteAtlas
    val rnd = new scala.util.Random(29)
    val ids = Seq(0L, 5L, 7L, 11L, 35L, 77L) ++
      Seq.fill(40)(math.abs(rnd.nextLong()) % 100000L)
    ids.foreach { id =>
      val nodes = parseSwc(synthSwc(id))
      val m = treeMetrics(id, nodes)
      val vox = NeuriteAtlas.typeVoxelRows(id, nodes)
      val feat = NeuriteAtlas.typeFeatureRows(id, nodes)
      // every non-soma node is attributed exactly once, in both kernels
      assert(vox.map(_.n_points).sum == m.n_points - 1, s"id=$id")
      assert(feat.map(_.n_points).sum == m.n_points - 1, s"id=$id")
      // sections and length split across types without loss
      assert(feat.map(_.n_sections).sum == m.n_sections, s"id=$id")
      assert(feat.map(_.cum_len_um).sum == m.total_len_um * NeuriteAtlas.ScaleUm, s"id=$id")
      // one leaf end per terminal section, consistently across kernels
      assert(vox.map(_.n_leaves).sum == feat.map(_.n_leaf_sections).sum, s"id=$id")
      assert(feat.map(_.n_leaf_sections).sum > 0, s"id=$id: a tree has terminal sections")
      // types partition the counts: same type set in both kernels
      assert(vox.map(_.neurite_type).toSet == feat.map(_.neurite_type).toSet, s"id=$id")
      // q98c distribution stats agree with the structural kernels
      val stats = NeuriteAtlas.typeSectionStats(id, nodes)
      assert(stats.map(s => s.neurite_type -> s.n_sections).toMap ==
        feat.map(f => f.neurite_type -> f.n_sections).toMap, s"id=$id")
      stats.foreach { s =>
        val cum = feat.find(_.neurite_type == s.neurite_type).get.cum_len_um
        // sections partition the type's length: mean*1000 = 1000·Σ DIV n
        assert(s.len_mean_milli == 1000L * cum / s.n_sections, s"id=$id ${s.neurite_type}")
        assert(s.len_min_um <= s.len_median_um && s.len_median_um <= s.len_max_um, s"id=$id")
        assert(s.len_var_milli >= 0, s"id=$id")
        assert(s.len_var_milli == 0 || s.len_min_um < s.len_max_um, s"id=$id")
      }
      // the per-type branch-order maxima roll up to q79's global max
      assert(stats.map(_.order_max).max == m.max_branch_order, s"id=$id")
      // q79b extents: point count matches the walk; the radial maximum
      // sits inside the bounding box's diagonal (and reaches at least
      // its longest edge — the soma anchors the fixture's min corner)
      val ext = NeuriteAtlas.morphExtentRow(id, nodes)
      assert(ext.n_points == m.n_points, s"id=$id")
      val edges = Seq(ext.width_um, ext.height_um, ext.depth_um)
      assert(ext.max_radial_sq_um2 <= edges.map(e => e * e).sum, s"id=$id")
      assert(ext.max_radial_sq_um2 >= edges.map(e => e * e).max, s"id=$id")
    }
  }

  test("decode-once report: every persisted view equals its standalone operator") {
    import graft.operators.NeuriteAtlas
    import org.apache.spark.sql.functions.{col, explode, sum}
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    // persist the one-decode report, then derive each family view from
    // the PARQUET (no payload re-read) and compare to the operator
    val out = java.nio.file.Files.createTempDirectory("graft_report").toString + "/r"
    NeuriteAtlas.morphReport(docs).write.mode("overwrite").parquet(out)
    val rep = spark.read.parquet(out)
    assert(rep.select(col("metrics.*")).collect().toSet ==
      graft.operators.Morphology.morphMetrics(docs).collect().toSet)
    assert(rep.select(col("extents.*")).collect().toSet ==
      NeuriteAtlas.morphExtents(docs).collect().toSet)
    assert(rep.select(explode(col("features")).as("f")).select(col("f.*"))
      .collect().toSet == NeuriteAtlas.neuriteFeatures(docs).collect().toSet)
    assert(rep.select(explode(col("section_stats")).as("s")).select(col("s.*"))
      .collect().toSet == NeuriteAtlas.sectionStats(docs).collect().toSet)
    // the q98 rollup from persisted voxel rows (broadcast label + sum)
    val (nat, reg) = (Tables.nation(spark, dir), Tables.region(spark, dir))
    val vox = rep.select(explode(col("voxels")).as("v")).select(col("v.*"))
    val viaReport = NeuriteAtlas.labelVoxelRows(vox, nat, reg)
      .groupBy("morph_id", "neurite_type", "region")
      .agg(sum("n_points").as("n_points"), sum("n_leaves").as("n_leaves"))
      .collect().toSet
    assert(viaReport ==
      NeuriteAtlas.leafRegionAttribution(docs, nat, reg).collect().toSet)
  }

  test("q98 attribution: regions resolve through the volume; outside/unclassified are first-class") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.NeuriteAtlas.leafRegionAttribution(
      Tables.documents(spark, dir), Tables.nation(spark, dir), Tables.region(spark, dir))
      .collect()
    assert(out.nonEmpty)
    val regions = out.map(_.getAs[String]("region")).toSet
    // the fixture must exercise every lookup path: real regions,
    // unclassified space, and out-of-volume points
    assert(regions.contains("(outside volume)"), "deep branches must leave the volume")
    assert(regions.contains("(unclassified)"), "some points must hit unclassified space")
    assert((regions - "(outside volume)" - "(unclassified)").nonEmpty,
      "most points must resolve to real regions")
    // per-morph totals agree with the per-type features (independent path)
    val byMorphVox = out.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getAs[Long]("n_points")).sum).toMap
    val feats = graft.operators.NeuriteAtlas.neuriteFeatures(Tables.documents(spark, dir))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getAs[Long]("n_points")).sum).toMap
    assert(byMorphVox == feats)
  }
}

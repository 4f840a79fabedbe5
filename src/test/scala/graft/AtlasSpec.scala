package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Atlas

/** q94/q95: voxel-atlas region resolution and the LCA report. */
class AtlasSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"
  private def cust = Tables.customer(spark, dir)
  private def nat = Tables.nation(spark, dir)
  private def reg = Tables.region(spark, dir)

  test("voxel grid covers every cell exactly once; unclassified cells resolve to null") {
    val g = Atlas.voxelGrid(spark, nat, reg).collect()
    assert(g.length == Atlas.GridSize * Atlas.GridSize * Atlas.GridSize)
    val nulls = g.count(_.isNullAt(3))
    assert(nulls > 0, "cell codes 30/31 must exist and resolve to nothing")
    // closed form replayed by hand for a sample cell
    g.foreach { r =>
      val v = (r.getLong(0) + 3 * r.getLong(1) + 7 * r.getLong(2)) % 32
      if (v >= 30) assert(r.isNullAt(3), s"cell code $v must be unclassified")
      else assert(!r.isNullAt(3), s"cell code $v must resolve")
    }
  }

  test("affine transform: rational spacing bins by floor; boundary positions take the higher voxel") {
    import org.apache.spark.sql.Row
    // spacing = 1875/2 = 937.5 µm, origin(axis 0) = −500 µm. A position
    // EXACTLY on a voxel boundary ((p + 500)·2 divisible by 1875) must
    // land in the higher voxel (floor semantics), and the half-µm
    // spacing must be honored exactly — 437 vs 438 µm straddles the
    // first boundary (937.5 − 500 = 437.5).
    val rows = Seq(
      0L -> 0L,      // origin-adjacent: (0+500)*2/1875 = 0
      437L -> 0L,    // just below the 437.5 µm boundary
      438L -> 1L,    // just above it — the half-µm den=2 matters
      1375L -> 2L,   // exact boundary: (1375+500)*2 = 3750 = 2·1875
      13999L -> 15L) // domain max stays inside the 16-voxel grid
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("um", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("want", org.apache.spark.sql.types.LongType))))
    val got = df.select(col("um"), col("want"),
      Atlas.worldToVoxel(col("um"), 0).as("ix")).collect()
    got.foreach(r => assert(r.getLong(2) == r.getLong(1),
      s"worldToVoxel(${r.getLong(0)}) = ${r.getLong(2)}, want ${r.getLong(1)}"))
    // every axis keeps the whole position domain inside the grid — the
    // q94 inner grid join must never drop an entity on bounds
    (0 to 2).foreach { ax =>
      val bounds = spark.range(0, Atlas.PosModUm)
        .select(Atlas.worldToVoxel(col("id"), ax).as("ix"))
        .agg(min("ix"), max("ix")).head()
      assert(bounds.getLong(0) >= 0 && bounds.getLong(1) < Atlas.GridSize,
        s"axis $ax: voxel range [${bounds.getLong(0)}, ${bounds.getLong(1)}] escapes the grid")
    }
  }

  test("region consistency verdicts are faithful to the hierarchy") {
    val natRegion = nat.join(reg, col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name"), col("r_name")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val out = Atlas.regionConsistency(cust, nat, reg).collect()
    assert(out.length == cust.count())
    val byRel = out.groupBy(_.getAs[String]("relationship"))
    // at 150 customers every verdict class should be populated except
    // possibly the rarest; require the load-bearing ones
    assert(byRel.contains("mismatch") && byRel.contains("unresolved"))
    out.foreach { r =>
      val decl = r.getAs[String]("declared_region")
      val comp = r.getAs[String]("computed_region")
      val rel = r.getAs[String]("relationship")
      val agree = r.getAs[Boolean]("agreement")
      assert(agree == Set("same region", "ancestor", "descendant").contains(rel))
      rel match {
        case "unresolved"  => assert(comp == null)
        case "same region" => assert(decl == comp)
        // computed must be declared's parent region (2-level hierarchy)
        case "ancestor"    => assert(natRegion(decl) == comp)
        case "descendant"  => assert(natRegion(comp) == decl)
        case "mismatch"    =>
          assert(comp != null && decl != comp
            && natRegion.get(decl) != Some(comp) && natRegion.get(comp) != Some(decl))
      }
    }
  }

  test("neighbour fallback: center verdict preserved, agreement only via a real neighbour") {
    val out = Atlas.regionConsistencyNeighbours(cust, nat, reg).collect()
    val center = Atlas.regionConsistency(cust, nat, reg).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("relationship")).toMap
    assert(out.length == center.size)
    out.foreach { r =>
      // the center verdict is exactly q94's (shared rule)
      assert(r.getAs[String]("relationship") == center(r.getLong(0)))
      val n = r.getAs[Long]("n_neighbour_regions")
      val agrees = r.getAs[Boolean]("neigh_agreement")
      assert(n >= 0 && n <= 6)
      if (agrees) {
        // the elected neighbour must exist, differ from the center
        // region, and carry an agreeing relationship
        assert(r.getAs[String]("neigh_region") != null)
        assert(!(r.getAs[String]("neigh_region") == r.getAs[String]("computed_region")))
        assert(Set("same region", "ancestor", "descendant")
          .contains(r.getAs[String]("neigh_relationship")))
      } else assert(r.getAs[String]("neigh_region") == null)
    }
    // the fallback must actually rescue some borderline disagreements
    assert(out.exists(r => !Set("same region", "ancestor", "descendant")
        .contains(r.getAs[String]("relationship"))
      && r.getAs[Boolean]("neigh_agreement")),
      "some mismatched/unresolved center should agree via a neighbour")
  }

  test("first common ancestor: same-region pairs meet at the region, others at WORLD") {
    val natRegion = nat.join(reg, col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name"), col("r_name")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val out = Atlas.firstCommonAncestor(cust, nat, reg).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val decl = r.getAs[String]("declared_region")
      val comp = r.getAs[String]("computed_region")
      val lca = r.getAs[String]("first_common_ancestor")
      assert(r.getAs[Long]("n_entities") > 0)
      // mismatch pairs only, so the LCA is never one of the two nodes
      assert(lca != decl && lca != comp)
      val declRegion = natRegion.getOrElse(decl, decl) // region declarations map to themselves
      val compRegion = natRegion.getOrElse(comp, comp)
      if (declRegion == compRegion) {
        assert(lca == declRegion, s"same-branch pair ($decl, $comp) must meet at $declRegion")
        assert(r.getAs[Int]("depth_from_declared") == (if (decl == declRegion) 0 else 1))
      } else {
        assert(lca == "WORLD", s"cross-region pair ($decl, $comp) must meet at WORLD")
      }
    }
  }
}

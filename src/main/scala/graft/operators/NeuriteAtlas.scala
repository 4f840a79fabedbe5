package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.Morphology.{MorphRow, SwcNode}

/** Section-leaf-region FEATURE ATTRIBUTION (SURVEY §2B, q98/q98b) —
  * the reference's one composed morphology×atlas computation: walk a
  * reconstruction's sections, convert each point through the
  * world→voxel affine into the annotation volume, and accumulate
  * per-NeuriteType metrics keyed by brain region
  * (/root/reference/src/neuron_morphology/feature_annotations/morph_metrics_dke.py:155-228
  * `_compute_section_leaf_regions`: per neurite type, cumulatedLength,
  * `traversedBrainRegion[region] += 1` for every section point, and
  * `projectionBrainRegion[region] += 1` for each terminal section's
  * LAST point; morph_metrics_dke.py:135 builds the world→voxel matrix
  * from the volume's spacing/origin header).
  *
  * Composed from the two proven halves — q79's section decomposition
  * ([[Morphology.decompose]]: the SAME decomposition object, so the
  * attribution cannot disagree with q79 about what a section is) and
  * q94's voxel volume + rational affine ([[Atlas.worldToVoxel]], the
  * same spacing/origin constants).
  *
  * Engine-defined semantics (documented divergences from the Python):
  *   - each NODE is counted once, attributed to its own type — the
  *     reference dedups on raw point coordinates morphology-wide
  *     (first section visiting a coordinate claims it); node identity
  *     is the relational form of that uniqueness and is engine-stable
  *     under repartitioning;
  *   - out-of-volume points are first-class rows under
  *     `(outside volume)` and unclassified space under
  *     `(unclassified)` — the reference logs warnings and drops both,
  *     but an audit wants the counts;
  *   - LOCAL→WORLD registration is part of the entity's metadata: the
  *     soma is placed at the q94 closed-form position and local
  *     coordinates scale by [[ScaleUm]] (integer µm, so the transform
  *     is exact in both engines) — a real deployment reads the
  *     registration from its atlasRelease instead;
  *   - cumulatedLength attributes each parent→node segment to the
  *     NODE's type (the type-change boundary segment belongs to the
  *     section it enters), in world µm.
  *
  * At 100 TB: the payload decode + walk + binning is row-local behind
  * the one skew-evening repartition (q79's shape) and pre-aggregates
  * per (type, voxel) INSIDE the kernel — a heavy blob reduces to at
  * most a few dozen narrow rows before any exchange. The annotation
  * volume is dimension-sized and broadcasts; the only data-sized
  * shuffle is the final map-side-combined (morph, type, region)
  * aggregate keyed by the high-cardinality entity id. */
object NeuriteAtlas {

  /** local-coordinate → world registration scale, integer µm per local
    * unit (isotropic). Sized so a typical reconstruction spans several
    * 937.5 µm voxels and deep branches can leave the volume — both
    * reference code paths (in-volume lookup, outside-bounds warning)
    * stay exercised. */
  val ScaleUm = 150L

  /** SWC type code → neurite-type name (the reference's
    * neurite_type_to_name mapping over standard SWC codes; soma is
    * excluded from attribution like the reference's final loop). */
  def typeName(t: Int): String = t match {
    case 2 => "axon"
    case 3 => "basal dendrite"
    case 4 => "apical dendrite"
    case other => s"custom type $other"
  }

  /** kernel output: per (type, voxel) point/leaf counts for one
    * morphology — the map-side pre-aggregation. */
  final case class TypeVoxelRow(
      morph_id: Long, neurite_type: String, in_volume: Boolean,
      ix: Long, iy: Long, iz: Long, n_points: Long, n_leaves: Long)

  /** kernel output: per-type structural features for one morphology. */
  final case class TypeFeatureRow(
      morph_id: Long, neurite_type: String, n_sections: Long,
      n_leaf_sections: Long, n_points: Long, cum_len_um: Long)

  /** world position of one node on one axis: soma placed at the q94
    * closed form, local offset scaled to integer µm. Coordinates are
    * rounded to integer local units first (the fixture is integral;
    * a real deployment carries rational registrations). */
  private def worldUm(somaWorld: Long, local: Double, somaLocal: Double): Long =
    somaWorld + math.round(local - somaLocal) * ScaleUm

  private def somaWorld(morphId: Long, axis: Int): Long = {
    val primes = Seq(7919L, 104729L, 1299709L)
    java.lang.Math.floorMod(morphId * primes(axis), Atlas.PosModUm)
  }

  /** voxel index per axis via the SAME rational affine as Atlas
    * (floorDiv so the kernel is exact even below the origin). */
  private def vox(um: Long, axis: Int): Long =
    Math.floorDiv((um - Atlas.OriginUm(axis)) * Atlas.SpacingDenUm,
      Atlas.SpacingNumUm)

  /** row-local attribution kernel: parse + decompose (q79's walk),
    * bin every non-soma node through the affine, pre-aggregate per
    * (type, voxel); terminal sections contribute their END node to the
    * leaf count (the reference's projectionBrainRegion). */
  def typeVoxelRows(morphId: Long, nodes: Seq[SwcNode]): Seq[TypeVoxelRow] =
    typeVoxelRows(morphId, nodes, Morphology.decompose(nodes))

  private[operators] def typeVoxelRows(morphId: Long, nodes: Seq[SwcNode],
                                       dec: Morphology.Decomp): Seq[TypeVoxelRow] = {
    val soma = dec.soma
    val sw = Array.tabulate(3)(somaWorld(morphId, _))
    def voxelOf(n: SwcNode): (Long, Long, Long) = (
      vox(worldUm(sw(0), n.x, soma.x), 0),
      vox(worldUm(sw(1), n.y, soma.y), 1),
      vox(worldUm(sw(2), n.z, soma.z), 2))
    val leafEnds: Set[Long] = dec.leafSections.map(st => dec.sectionEnd(st.id)).toSet
    val acc = scala.collection.mutable.LinkedHashMap
      .empty[(String, Long, Long, Long), (Long, Long)]
    nodes.foreach { n =>
      if (n.id != soma.id) {
        val (ix, iy, iz) = voxelOf(n)
        val key = (typeName(n.typ), ix, iy, iz)
        val (p, l) = acc.getOrElse(key, (0L, 0L))
        acc(key) = (p + 1, l + (if (leafEnds.contains(n.id)) 1 else 0))
      }
    }
    acc.iterator.map { case ((tn, ix, iy, iz), (p, l)) =>
      val inVol = Seq(ix, iy, iz).forall(i => i >= 0 && i < Atlas.GridSize)
      TypeVoxelRow(morphId, tn, inVol, ix, iy, iz, p, l)
    }.toSeq
  }

  /** row-local per-type feature kernel: section/leaf-section/point
    * counts and cumulated world-µm length per neurite type. */
  def typeFeatureRows(morphId: Long, nodes: Seq[SwcNode]): Seq[TypeFeatureRow] =
    typeFeatureRows(morphId, nodes, Morphology.decompose(nodes))

  private[operators] def typeFeatureRows(morphId: Long, nodes: Seq[SwcNode],
                                         dec: Morphology.Decomp): Seq[TypeFeatureRow] = {
    val soma = dec.soma
    val leafStarts = dec.leafSections.map(_.id).toSet
    val secs = scala.collection.mutable.Map.empty[String, (Long, Long)]
    dec.starts.foreach { st =>
      val tn = typeName(st.typ)
      val (s, l) = secs.getOrElse(tn, (0L, 0L))
      secs(tn) = (s + 1, l + (if (leafStarts.contains(st.id)) 1 else 0))
    }
    val pts = scala.collection.mutable.Map.empty[String, Long]
    val len = scala.collection.mutable.Map.empty[String, Double]
    nodes.foreach { n =>
      if (n.id != soma.id) {
        val tn = typeName(n.typ)
        pts(tn) = pts.getOrElse(tn, 0L) + 1
        val p = dec.byId(n.parent)
        val dx = n.x - p.x; val dy = n.y - p.y; val dz = n.z - p.z
        len(tn) = len.getOrElse(tn, 0.0) + math.sqrt(dx * dx + dy * dy + dz * dz)
      }
    }
    secs.keys.toSeq.sorted.map { tn =>
      val (s, l) = secs(tn)
      TypeFeatureRow(morphId, tn, s, l, pts.getOrElse(tn, 0L),
        math.round(len.getOrElse(tn, 0.0) * ScaleUm))
    }
  }

  /** kernel output: per-type SECTION DISTRIBUTION summary for one
    * morphology (q98c). */
  final case class SectionStatsRow(
      morph_id: Long, neurite_type: String, n_sections: Long,
      len_min_um: Long, len_max_um: Long, len_median_um: Long,
      len_mean_milli: Long, len_var_milli: Long, order_max: Long)

  /** row-local distribution kernel (q98c): per neurite type, summary
    * statistics over the per-SECTION length distribution (world µm)
    * and the branch-order maximum — the reference's METRIC_CONFIG
    * shape (morph_metrics_neurom.py:33-64: distribution features like
    * section_lengths/section_branch_orders extract
    * min/max/median/mean/std per neurite). Engine-exact forms:
    * lower median (element (n−1)/2 of the sorted lengths — no
    * half-sum, so integer-exact), mean ×1000 under truncating
    * division, and VARIANCE ×1000 in the n·Σx²−(Σx)² integer form in
    * place of std (std is an irrational sqrt; variance is monotone in
    * it and exact in both engines). */
  def typeSectionStats(morphId: Long, nodes: Seq[SwcNode]): Seq[SectionStatsRow] =
    typeSectionStats(morphId, nodes, Morphology.decompose(nodes))

  private[operators] def typeSectionStats(morphId: Long, nodes: Seq[SwcNode],
                                          dec: Morphology.Decomp): Seq[SectionStatsRow] = {
    val depths = Morphology.sectionDepths(dec)
    val segLen = scala.collection.mutable.LongMap.empty[Double]
    nodes.foreach { n =>
      if (n.id != dec.soma.id) {
        val p = dec.byId(n.parent)
        val dx = n.x - p.x; val dy = n.y - p.y; val dz = n.z - p.z
        val sec = dec.sectionOf(n.id)
        segLen(sec) = segLen.getOrElse(sec, 0.0) + math.sqrt(dx * dx + dy * dy + dz * dz)
      }
    }
    dec.starts.groupBy(st => typeName(st.typ)).toSeq.sortBy(_._1).map {
      case (tn, sts) =>
        val lens = sts.map(st => math.round(segLen(st.id) * ScaleUm)).sorted
        val n = lens.length
        val sum = lens.sum
        val sumSq = lens.map(l => l * l).sum
        SectionStatsRow(morphId, tn, n.toLong,
          lens.head, lens.last, lens((n - 1) / 2),
          1000L * sum / n,
          (n.toLong * sumSq - sum * sum) * 1000L / (n.toLong * n),
          sts.map(st => depths(st.id)).max)
    }
  }

  /** kernel output: whole-morphology spatial extents (q79b). */
  final case class MorphExtentRow(
      morph_id: Long, width_um: Long, height_um: Long, depth_um: Long,
      max_radial_sq_um2: Long, n_points: Long)

  /** row-local extents kernel (q79b): the reference's morphology-
    * namespace spatial features (morph_metrics_neurom.py METRIC_CONFIG
    * 'morphology': total_width/height/depth, max_radial_distance) —
    * per-axis bounding-box extents in world µm over ALL nodes (soma
    * included, as neurom's bounding box is), and the maximum SQUARED
    * radial distance from the soma in µm² (the distance itself is an
    * irrational sqrt; the squared form is monotone in it and
    * integer-exact in both engines — the q79 radical-screen
    * discipline). */
  def morphExtentRow(morphId: Long, nodes: Seq[SwcNode]): MorphExtentRow =
    morphExtentRow(morphId, nodes, Morphology.decompose(nodes))

  private[operators] def morphExtentRow(morphId: Long, nodes: Seq[SwcNode],
                                        dec: Morphology.Decomp): MorphExtentRow = {
    val soma = dec.soma
    def ext(f: SwcNode => Double, somaLocal: Double): Long = {
      val ds = nodes.map(n => math.round(f(n) - somaLocal))
      (ds.max - ds.min) * ScaleUm
    }
    val maxRadSq = nodes.map { n =>
      val dx = math.round(n.x - soma.x) * ScaleUm
      val dy = math.round(n.y - soma.y) * ScaleUm
      val dz = math.round(n.z - soma.z) * ScaleUm
      dx * dx + dy * dy + dz * dz
    }.max
    MorphExtentRow(morphId, ext(_.x, soma.x), ext(_.y, soma.y), ext(_.z, soma.z),
      maxRadSq, nodes.length.toLong)
  }

  private def decoded[A](documents: DataFrame, partitions: Int)(
      kernel: MorphRow => Seq[A])(implicit enc: org.apache.spark.sql.Encoder[A]): Dataset[A] = {
    val spark = documents.sparkSession
    import spark.implicits._
    val width = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    Morphology.morphFrame(documents)
      .repartition(width, col("morph_id"))
      .as[MorphRow]
      .mapPartitions(_.flatMap(kernel))
  }

  /** shared attribution step: voxel rows → region-labeled rows via the
    * broadcast volume (stream-static safe — the grid is a bounded
    * static dimension, the q94 frozen-volume contract). Public as
    * [[labelVoxelRows]] so a persisted [[morphReport]]'s voxel rows
    * re-attribute without touching payloads (e.g. after an atlas
    * release swaps the volume). */
  def labelVoxelRows(rows: DataFrame, nation: DataFrame,
                     region: DataFrame): DataFrame = labeled(rows, nation, region)

  private def labeled(rows: DataFrame, nation: DataFrame,
                      region: DataFrame): DataFrame = {
    val grid = Atlas.voxelGrid(rows.sparkSession, nation, region)
    rows
      .join(broadcast(grid), Seq("ix", "iy", "iz"), "left")
      .withColumn("region",
        when(!col("in_volume"), lit("(outside volume)"))
          .otherwise(coalesce(col("computed_region"), lit("(unclassified)"))))
      .select("morph_id", "neurite_type", "region", "n_points", "n_leaves")
  }

  /** q98: SECTION-LEAF-REGION attribution — one row per
    * (morphology, neurite type, region) with the traversed-point count
    * (every section point of that type whose voxel resolves there) and
    * the leaf count (terminal sections whose end point lands there).
    * Volume lookup = broadcast join against the q94 grid; the kernel's
    * per-(type, voxel) pre-aggregation bounds the join input by the
    * touched-voxel count, not the point count. */
  def leafRegionAttribution(documents: DataFrame, nation: DataFrame,
                            region: DataFrame, partitions: Int = 0): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val rows = decoded(documents, partitions)(r =>
      typeVoxelRows(r.morph_id, Morphology.parseSwc(r.swc))).toDF()
    labeled(rows, nation, region)
      .groupBy("morph_id", "neurite_type", "region")
      .agg(sum("n_points").as("n_points"), sum("n_leaves").as("n_leaves"))
      .orderBy("morph_id", "neurite_type", "region")
  }

  /** stream-safe attribution (q98's stream twin, pre-rollup): the same
    * kernel + broadcast volume label, stateless and row-local — no
    * repartition, no aggregation, no sort. Each arriving morphology
    * yields its (type, region) count rows the moment it lands; within
    * one morphology the kernel has already combined duplicate voxels,
    * so per-(morph, type, region) rows need only a trivial downstream
    * sum if a consumer wants the batch q98 rollup (spec-proven equal). */
  def leafRegionRowsLocal(documents: DataFrame, nation: DataFrame,
                          region: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    labeled(Morphology.morphFrame(documents)
      .mapPartitions(_.flatMap(r =>
        typeVoxelRows(r.morph_id, Morphology.parseSwc(r.swc)))).toDF(),
      nation, region)
  }

  /** q98b: per-type NEURITE FEATURES — the cumulatedLength/section
    * structure half of the reference's neuriteFeature record. Pure
    * kernel output: one scan, zero exchanges before the output sort. */
  def neuriteFeatures(documents: DataFrame, partitions: Int = 0): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    decoded(documents, partitions)(r =>
      typeFeatureRows(r.morph_id, Morphology.parseSwc(r.swc))).toDF()
      .orderBy("morph_id", "neurite_type")
  }

  /** q98c: per-type SECTION DISTRIBUTION statistics — join-free like
    * q98b; the whole distribution summary is per-entity work riding
    * the decode scan. */
  def sectionStats(documents: DataFrame, partitions: Int = 0): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    decoded(documents, partitions)(r =>
      typeSectionStats(r.morph_id, Morphology.parseSwc(r.swc))).toDF()
      .orderBy("morph_id", "neurite_type")
  }

  /** q79b: whole-morphology spatial extents — join-free, one row per
    * entity off the decode scan. */
  def morphExtents(documents: DataFrame, partitions: Int = 0): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    decoded(documents, partitions)(r =>
      Seq(morphExtentRow(r.morph_id, Morphology.parseSwc(r.swc)))).toDF()
      .orderBy("morph_id")
  }

  // ------------------------------------- decode-once combined report

  /** the full per-entity record every family view derives from —
    * ONE parse + ONE decomposition per payload. */
  final case class MorphReport(
      morph_id: Long,
      metrics: Morphology.MorphMetrics,
      extents: MorphExtentRow,
      features: Seq[TypeFeatureRow],
      section_stats: Seq[SectionStatsRow],
      voxels: Seq[TypeVoxelRow])

  /** DECODE-ONCE report frame — the 100 TB shape of this family: the
    * standalone operators (q79/q79b/q98/q98b/q98c) each pay a full
    * payload decode, which is the dominant cost at scale; a deployment
    * decodes ONCE, persists this nested frame (narrow structs +
    * bounded arrays, a tiny fraction of the payload bytes), and every
    * view becomes a cheap column read / explode over the persisted
    * parquet — no payload is ever re-read. The kernels are the SAME
    * objects the standalone operators run (one shared decomposition
    * per entity), so the views cannot drift — spec-proven equal. */
  def morphReport(documents: DataFrame, partitions: Int = 0): Dataset[MorphReport] = {
    val spark = documents.sparkSession
    import spark.implicits._
    decoded(documents, partitions) { r =>
      val nodes = Morphology.parseSwc(r.swc)
      val dec = Morphology.decompose(nodes)
      Seq(MorphReport(r.morph_id,
        Morphology.treeMetrics(r.morph_id, nodes, dec),
        morphExtentRow(r.morph_id, nodes, dec),
        typeFeatureRows(r.morph_id, nodes, dec),
        typeSectionStats(r.morph_id, nodes, dec),
        typeVoxelRows(r.morph_id, nodes, dec)))
    }
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Referential-integrity checking — the Spark re-expression of the
  * reference's link checker (reference
  * src/neuron_morphology/validation/check_links.py:20-66), which loops
  * `forge.retrieve(id)` per reference column per resource and flags
  * (a) ids that don't resolve and (b) duplicated labels that drifted
  * from the target's label.
  *
  * Here each reference column becomes one broadcast (or shuffle, if the
  * dimension is large) left join against the distinct target keys — the
  * per-row Python loop with an LRU cache becomes a join the optimizer
  * can reorder, and scales to any number of rows.
  */
object LinkCheck {

  /** One reference to check: `refCol` in the fact frame should resolve
    * into `dim`'s `dimKey`. If `labelCol`/`dimLabel` are given, the
    * fact's duplicated label is also compared against the target's
    * (check_links.py "label is the same"). `hint` broadcasts dims known
    * to be small; leave false to let AQE decide.
    */
  final case class Ref(
      name: String,
      refCol: String,
      dim: DataFrame,
      dimKey: String,
      labelCol: Option[String] = None,
      dimLabel: Option[String] = None,
      broadcastDim: Boolean = true)

  /** Per-row report: the id column(s) plus, per ref, a
    * `<name>_resolvable` boolean and optionally `<name>_label_ok`. */
  def check(fact: DataFrame, idCols: Seq[String], refs: Seq[Ref]): DataFrame = {
    val joined = refs.foldLeft(fact) { (acc, r) =>
      val cols = r.dimKey +: r.dimLabel.toSeq
      val side0 = r.dim.select(cols.map(c => col(c).as(s"__${r.name}_$c")): _*).distinct()
      val side = if (r.broadcastDim) broadcast(side0) else side0
      acc.join(side, col(r.refCol) === col(s"__${r.name}_${r.dimKey}"), "left")
    }
    val flagCols: Seq[Column] = refs.flatMap { r =>
      val resolvable = col(s"__${r.name}_${r.dimKey}").isNotNull.as(s"${r.name}_resolvable")
      val labelOk = for (lc <- r.labelCol; dl <- r.dimLabel) yield
        (col(s"__${r.name}_${r.dimKey}").isNotNull &&
          col(lc) === col(s"__${r.name}_$dl")).as(s"${r.name}_label_ok")
      resolvable +: labelOk.toSeq
    }
    joined.select(idCols.map(col) ++ flagCols: _*)
  }

  /** Aggregate the per-row report into the reference's summary shape
    * (how many links are broken per ref). */
  def summary(report: DataFrame, flagCols: Seq[String]): DataFrame = {
    val aggs = flagCols.flatMap { c =>
      Seq(count(when(!col(c), 1)).as(s"${c}_failures"))
    }
    report.agg(aggs.head, aggs.tail: _*)
  }
}

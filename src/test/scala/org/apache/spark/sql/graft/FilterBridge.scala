package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.sources.Filter

/** Test-only bridge to the planner's own pushability test
  * (`DataSourceStrategy.translateFilter` is protected[sql]): the
  * PlanShapeSpec pushdown fence uses it to decide whether a
  * dataFilter COULD have been pushed to the source, so a scan that
  * pushes one plain predicate while leaving another translatable one
  * behind fails the suite (ADVICE r19).
  */
object FilterBridge {
  def translate(predicate: Expression): Option[Filter] =
    DataSourceStrategy.translateFilter(
      predicate, supportNestedPredicatePushdown = true)
}

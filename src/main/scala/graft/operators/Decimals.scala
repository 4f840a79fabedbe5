package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Decimal discipline for oracle-stable aggregation.
  *
  * Sums of doubles are order-dependent (IEEE addition does not
  * associate), so a 32-partition Spark sum and a single-threaded DuckDB
  * sum of the same column can differ in the last bits and fail a hash
  * compare. All money/quantity aggregation therefore casts the source
  * column to a decimal at its natural scale FIRST; decimal addition is
  * exact and order-independent, so any partitioning yields the same
  * result. Final aggregates are cast to DECIMAL(38,s) so the Spark and
  * DuckDB output schemas agree exactly.
  */
object Decimals {
  /** 2-decimal money/quantity column (l_extendedprice, o_totalprice…). */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  /** small 2-decimal rate column (l_discount, l_tax). */
  def rate2(c: Column): Column = c.cast(DecimalType(4, 2))
  /** 6-decimal measure (events.value). */
  def dec6(c: Column): Column = c.cast(DecimalType(18, 6))

  /** order-independent sum of a 2-decimal double column → DECIMAL(38,2). */
  def sum2(c: Column): Column = sum(dec2(c)).cast(DecimalType(38, 2))
  /** order-independent sum of a 6-decimal double column → DECIMAL(38,6). */
  def sum6(c: Column): Column = sum(dec6(c)).cast(DecimalType(38, 6))

  /** revenue term price*(1-discount), exact decimal, summed → DECIMAL(38,4).
    * The product of DECIMAL(12,2) and DECIMAL(4,2) has ≤4 decimals; the
    * explicit DECIMAL(18,4) cast pins the intermediate type in both
    * engines before the sum. */
  def sumRevenue(price: Column, discount: Column): Column =
    sum((dec2(price) * (lit(1).cast(DecimalType(4, 2)) - rate2(discount)))
      .cast(DecimalType(18, 4))).cast(DecimalType(38, 4))
}

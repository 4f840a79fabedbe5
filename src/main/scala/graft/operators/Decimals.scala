package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Decimal discipline for oracle-stable aggregation.
  *
  * Sums of doubles are order-dependent (IEEE addition does not
  * associate), so a 32-partition Spark sum and a single-threaded DuckDB
  * sum of the same column can differ in the last bits and fail a hash
  * compare. All money/quantity aggregation therefore casts the source
  * column to a decimal at its natural scale FIRST; decimal addition is
  * exact and order-independent, so any partitioning yields the same
  * result.
  *
  * OUTPUT BOUNDARY: the final aggregate is emitted as a fixed-point
  * BIGINT at the column's natural scale (×100 for 2-decimal money,
  * ×10⁴ for the 4-decimal revenue term, ×10⁶ for 6-decimal measures) —
  * NOT as a decimal. Decimal output columns render differently between
  * Spark-written parquet and DuckDB results (and DuckDB's
  * DECIMAL→DOUBLE cast is not correctly rounded — measured ~3% last-ulp
  * mismatches), so scaled integers are the only representation that
  * hash-compares exactly across engines. The scale hop (decimal × 10^s
  * → BIGINT) is exact integer arithmetic in both engines.
  */
object Decimals {
  /** 2-decimal money/quantity column (l_extendedprice, o_totalprice…). */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  /** small 2-decimal rate column (l_discount, l_tax). */
  def rate2(c: Column): Column = c.cast(DecimalType(4, 2))
  /** 6-decimal measure (events.value). */
  def dec6(c: Column): Column = c.cast(DecimalType(18, 6))

  /** exact decimal → fixed-point BIGINT output boundary. */
  def asScaledLong(c: Column, scale: Int): Column =
    (c * math.pow(10, scale).toLong).cast(LongType)

  /** order-independent sum of a 2-decimal double column → BIGINT ×100. */
  def sum2(c: Column): Column = asScaledLong(sum(dec2(c)), 2)
  /** order-independent sum of a 6-decimal double column → BIGINT ×10⁶. */
  def sum6(c: Column): Column = asScaledLong(sum(dec6(c)), 6)

  /** revenue term price*(1-discount), exact decimal, summed → BIGINT ×10⁴.
    * The product of DECIMAL(12,2) and DECIMAL(4,2) has ≤4 decimals; the
    * explicit DECIMAL(18,4) cast pins the intermediate type in both
    * engines before the sum. */
  def sumRevenue(price: Column, discount: Column): Column =
    asScaledLong(sum((dec2(price) * (lit(1).cast(DecimalType(4, 2)) - rate2(discount)))
      .cast(DecimalType(18, 4))), 4)
}

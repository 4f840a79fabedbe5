package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KmvSketch

class KmvSketchSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("kmv sketch is exact below k") {
    val df = (1 to 100).map(i => s"val$i").toDF("s")
    val sketch = df.agg(KmvSketch.kmv_sketch(xxhash64(col("s")), k = 256))
      .collect().head.getSeq[Long](0)
    assert(sketch.size == 100)
    assert(KmvSketch.estimate(sketch, 256) == 100.0)
  }

  test("kmv sketch estimates large distinct counts within 15%") {
    val df = (1 to 50000).map(i => s"item$i").toDF("s")
      .repartition(8) // force partial buffers + merge
    val sketch = df.agg(KmvSketch.kmv_sketch(xxhash64(col("s")), k = 256))
      .collect().head.getSeq[Long](0)
    assert(sketch.size == 256)
    val est = KmvSketch.estimate(sketch, 256)
    assert(math.abs(est - 50000) / 50000 < 0.15, s"estimate $est")
  }

  test("kmv sketch works per group") {
    val docs = Tables.documents(spark, sf)
    val out = docs.groupBy("lang")
      .agg(KmvSketch.kmv_sketch(xxhash64(col("text")), k = 64).as("sk"),
        countDistinct(col("text")).as("exact"))
      .collect()
    out.foreach { r =>
      val est = KmvSketch.estimate(r.getSeq[Long](r.fieldIndex("sk")), 64)
      val exact = r.getLong(r.fieldIndex("exact"))
      assert(math.abs(est - exact) / math.max(exact, 1) < 0.35,
        s"lang ${r.getString(0)}: est $est vs exact $exact")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scale

class ScaleSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("salted join returns exactly the plain join's rows on skewed data") {
    // 90% of left rows share one hot key
    val left = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, s"v$i"))
      .toDF("k", "payload")
    val right = Seq((1L, "hot"), (950L, "cold"), (2000L, "unmatched"))
      .toDF("k", "label")
    val plain = left.join(right, Seq("k")).select("k", "payload", "label")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = Scale.saltedJoin(left, right, "k", salts = 8)
      .select("k", "payload", "label")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.sameElements(plain))
    assert(plain.length == 901)
  }

  test("stats-driven skew join salts only measured hot keys and matches the plain join") {
    // key 1 holds 60% of rows; everything else is uniform singletons
    val left = (1 to 1000).map(i => (if (i <= 600) 1L else i.toLong, s"v$i"))
      .toDF("k", "payload")
    val right = ((1L to 1000L).map(k => (k, s"r$k"))).toDF("k", "label")
    val hot = Scale.hotKeys(left, "k", hotShareBp = 1000, capacity = 64)
    assert(hot == Seq(1L), s"only the measured hot key qualifies: $hot")
    // any key type works — the sketch runs over xxhash64(key)
    val urls = (1 to 100).map(i => Tuple1(if (i <= 60) "https://hot.example" else s"https://u$i"))
      .toDF("url")
    val hotUrls = Scale.hotKeys(urls, "url", hotShareBp = 1000, capacity = 64)
    assert(hotUrls == Seq("https://hot.example"), s"string hot key: $hotUrls")
    val plain = left.join(right, Seq("k")).select("k", "payload", "label")
      .collect().map(_.toSeq).sortBy(_.toString)
    val skew = Scale.skewAwareJoin(left, right, "k", salts = 8, hotShareBp = 1000)
      .select("k", "payload", "label")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(skew.sameElements(plain))
    // the hot path spreads key 1 across salt sub-keys: no single
    // (k, salt) group carries the whole hot key
    val saltSpread = left.filter($"k" === 1L)
      .withColumn("__salt", pmod(hash(left.columns.map(col).toSeq: _*), lit(8)))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(saltSpread.length > 1 && saltSpread.max < 600)
  }

  test("bucketed tables join without a shuffle exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Scale.writeBucketed(Tables.orders(spark, sf), "orders_b", "o_orderkey", 4)
      Scale.writeBucketed(
        Tables.lineitem(spark, sf).groupBy("l_orderkey").agg(count(lit(1)).as("n")),
        "li_b", "l_orderkey", 4)
      val joined = spark.table("orders_b")
        .join(spark.table("li_b"), col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS li_b")
    }
  }

  test("bucketed band index joins near-dup lookups without exchanging the corpus side") {
    // substantiates nearDupLookup's scale claim: persist the corpus
    // band index bucketed on the join key, and only the (small) probe
    // side shuffles — the corpus-sized index reads pre-partitioned
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = Tables.documents(spark, sf)
      graft.operators.Dedup.minhashBands(docs)
        .write.mode("overwrite")
        .bucketBy(8, "band_idx", "band_hash")
        .sortBy("band_idx", "band_hash")
        .saveAsTable("band_index_b")
      val probe = graft.operators.Dedup.minhashBands(docs.filter(col("doc_id") < 5))
        .withColumnRenamed("doc_id", "new_doc_id")
      val joined = probe.join(
        spark.table("band_index_b").withColumnRenamed("doc_id", "corpus_doc_id"),
        Seq("band_idx", "band_hash"))
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
        s"only the probe side may shuffle, the index must read pre-bucketed:\n$plan")
      assert(joined.count() > 0, "identical docs must collide with their own bands")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS band_index_b")
    }
  }

  test("sketch aggregates land within tolerance of exact values") {
    val orders = Tables.orders(spark, sf)
    val exact = orders.agg(countDistinct(col("o_custkey"))).collect().head.getLong(0)
    val approx = orders.agg(approx_count_distinct(col("o_custkey")))
      .collect().head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"hll $approx vs exact $exact")
    val p = orders.agg(
      expr("percentile(o_totalprice, 0.5)"),
      expr("approx_percentile(o_totalprice, 0.5, 1000)")).collect().head
    assert(math.abs(p.getDouble(0) - p.getDouble(1)) / p.getDouble(0) < 0.05)
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    // test-scale data sits below the production thresholds, so lower
    // them to force the injection the session enables for real scale
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val ev = Tables.events(spark, sf)
      val cust = Tables.customer(spark, sf).filter(col("c_acctbal") > 4000)
      val plan = ev.join(cust, ev("user_id") === cust("c_custkey"))
        .queryExecution.executedPlan.toString()
      assert(plan.contains("might_contain"),
        "expected a runtime bloom-filter predicate on the probe side")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed running sum equals the naive per-group window exactly") {
    // ids deliberately sparse + shuffled input order; spans small enough
    // that every group straddles many buckets; negative values exercise
    // non-monotone partial sums
    for (seed <- Seq(7, 23, 101)) {
      val rnd = new scala.util.Random(seed)
      val rows = rnd.shuffle((0 until 2000).map { i =>
        (s"g${i % 3}", i.toLong * 3 + (i % 2), rnd.nextInt(200).toLong - 50L)
      })
      val df = rows.toDF("g", "id", "v").repartition(8)
      val naive = df.withColumn("cum",
        sum("v").over(org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy("id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .select("g", "id", "cum").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val bucketed = Scale.bucketedRunningSum(df, "g", "id", "v", "cum", bucketSpan = 100L)
        .select("g", "id", "cum").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(bucketed == naive, s"seed $seed")
    }
  }

  test("bucketed running sum is exact for negative order keys (floor-div buckets)") {
    // truncating DIV would fold -99..-1 into bucket 0 together with
    // 0..99, breaking the monotone-bucket precondition; floor division
    // keeps buckets monotone over the whole integer range
    val rnd = new scala.util.Random(13)
    val rows = rnd.shuffle((-500 until 500).map { i =>
      ("g" + math.abs(i % 2), i.toLong * 3, rnd.nextInt(100).toLong - 20L)
    })
    val df = rows.toDF("g", "id", "v").repartition(8)
    val naive = df.withColumn("cum",
      sum("v").over(org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy("id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select("g", "id", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val bucketed = Scale.bucketedRunningSum(df, "g", "id", "v", "cum", bucketSpan = 100L)
      .select("g", "id", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(bucketed == naive)
  }

  test("bucketed running sum keeps null groups — a valid window partition") {
    val df = Seq((Some("g"), 1L, 5L), (None, 2L, 7L), (None, 3L, 11L))
      .toDF("g", "id", "v")
    val got = Scale.bucketedRunningSum(df, "g", "id", "v", "cum", bucketSpan = 100L)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 5L, 2L -> 7L, 3L -> 18L),
      s"null-group rows must accumulate like any other partition, got $got")
  }

  test("bucketed running sum never materialises a whole group in one window partition") {
    // the point of the two-level form: intra-bucket windows are keyed by
    // (group, bucket), so the plan's full-data Window must sort/partition
    // on BOTH — a window specced on the group alone would be the
    // one-task-per-group shape this primitive exists to avoid
    val df = (0 until 1000).map(i => ("g", i.toLong, 1L)).toDF("g", "id", "v")
    val plan = Scale.bucketedRunningSum(df, "g", "id", "v", "cum", bucketSpan = 50L)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("__bucket"),
      "expected the intra-bucket window keyed by (group, __bucket)")
  }
}

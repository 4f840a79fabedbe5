package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink coverage (SURVEY.md §2E): csv/json round trips and
  * partitioned parquet writes — the report outputs the reference emits
  * as CSV/TSV/JSON (check_links.csv, batch_report.tsv, per-resource
  * json). */
class SourcesSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("csv round trip preserves the link-check report") {
    val report = SparkEntry.queries("q20_link_check")(spark, sf).limit(100)
    val dir = tmp("graft_csv")
    report.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.count() == report.count())
    assert(back.columns.sorted.sameElements(report.columns.sorted))
  }

  test("json round trip preserves values") {
    val df = SparkEntry.queries("q21_schema_validation")(spark, sf)
    val dir = tmp("graft_json")
    df.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == df.count())
  }

  test("csv format twin keeps NULL and empty string distinct") {
    // with quoteAll, a NULL string would otherwise write as "" and read
    // back as empty — viaFormat's nullValue sentinel must disambiguate
    import spark.implicits._
    val df = Seq((1L, "plain"), (2L, null.asInstanceOf[String]), (3L, ""))
      .toDF("id", "text")
    val back = SparkEntry.viaFormat(df, "csv", "null_twin").orderBy("id").collect()
    assert(back(0).getString(1) == "plain")
    assert(back(1).isNullAt(1), "NULL must survive the CSV round trip as NULL")
    assert(back(2).getString(1) == "", "empty string must stay empty, not become NULL")
    val backJson = SparkEntry.viaFormat(df, "json", "null_twin").orderBy("id").collect()
    assert(backJson(1).isNullAt(1) && backJson(2).getString(1) == "")
  }

  test("tsv (tab-delimited csv) report like the reference batch report") {
    val df = SparkEntry.queries("q22_quality_metrics")(spark, sf).limit(50)
    val dir = tmp("graft_tsv")
    df.write.mode("overwrite").option("sep", "\t").option("header", "true").csv(dir)
    val back = spark.read.option("sep", "\t").option("header", "true").csv(dir)
    assert(back.count() == 50)
  }

  test("partitioned parquet write produces partition directories and prunes") {
    val dir = tmp("graft_part")
    Tables.orders(spark, sf).write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("o_orderstatus") === "F")
    val scanned = back.queryExecution.executedPlan.toString()
    assert(new java.io.File(dir).list().exists(_.startsWith("o_orderstatus=")))
    assert(back.count() > 0)
    // partition filter must prune, not scan+filter
    assert(!scanned.contains("Filter (o_orderstatus"), "partition filter should be pruned at scan")
  }

  test("persisted ivf-pq index prunes to the probed cells' partitions") {
    // the q78 scale claim made concrete: write the (vec_id, cell,
    // pq_code) index partitionBy(cell); a probe restricted to its
    // cells must PRUNE at the scan — never read, then filter
    val emb = Tables.embeddings(spark, sf)
    val index = graft.operators.Similarity.buildIvfPqIndex(emb)
    val dir = tmp("graft_ivfpq_index")
    index.write.mode("overwrite").partitionBy("cell").parquet(dir)
    assert(new java.io.File(dir).list().exists(_.startsWith("cell=")),
      "index must lay out one directory per cell")
    val probe = spark.read.parquet(dir).filter(col("cell").isin(2, 5))
    val plan = probe.queryExecution.executedPlan.toString()
    assert(!plan.contains("Filter (cell"),
      "cell restriction must prune partitions at the scan, not filter after it")
    assert(probe.count() ==
      index.filter(col("cell").isin(2, 5)).count(),
      "pruned read returns exactly the probed cells' rows")
    // the persisted index round-trips the codes exactly
    val back = spark.read.parquet(dir)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("pq_code")).toMap
    val want = index.collect().map(r => r.getLong(0) -> r.getAs[Long]("pq_code")).toMap
    assert(back == want)
  }

  test("catalog-registered indexes: named round trip, pruning intact, bucketed codes") {
    // the persisted-index layout (SourcesSpec test above) addressable
    // by NAME: saveAsTable + spark.table must preserve both the values
    // and the partition-pruning behavior external readers rely on
    val emb = Tables.embeddings(spark, sf)
    graft.sources.IndexCatalog.registerIvfPqIndex(emb, "graft_ivfpq_t")
    graft.sources.IndexCatalog.registerPqCodes(emb, "graft_pqcodes_t")
    try {
      val byName = spark.table("graft_ivfpq_t")
      val direct = graft.operators.Similarity.buildIvfPqIndex(emb)
      assert(byName.collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("pq_code")).toMap
        == direct.collect().map(r => r.getLong(0) -> r.getAs[Long]("pq_code")).toMap,
        "catalog round trip must preserve the codes exactly")
      // probe through the external-reader path: still pruned at scan
      val probe = graft.sources.IndexCatalog.probeCells(spark, "graft_ivfpq_t", Seq(2, 5))
      val plan = probe.queryExecution.executedPlan.toString()
      assert(!plan.contains("Filter (cell"),
        "catalog probe must prune partitions at the scan, not filter after it")
      assert(probe.count() == direct.filter(col("cell").isin(2, 5)).count())
      // the code table is bucketed: the catalog records the spec
      val cat = spark.sql("DESCRIBE TABLE EXTENDED graft_pqcodes_t")
        .collect().map(r => r.getString(0) + " " + r.getString(1)).mkString("\n")
      assert(cat.contains("Num Buckets") && cat.contains("vec_id"),
        s"bucket spec must be recorded in the catalog:\n$cat")
      assert(spark.table("graft_pqcodes_t").count() == emb.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_ivfpq_t")
      spark.sql("DROP TABLE IF EXISTS graft_pqcodes_t")
    }
  }

  test("catalog-registered vec report: named round trip, views intact, cell pruning at the scan") {
    val emb = Tables.embeddings(spark, sf)
    graft.sources.IndexCatalog.registerVecReport(emb, "graft_vecreport_t")
    try {
      val byName = spark.table("graft_vecreport_t")
      // views over the CATALOG table equal the standalone operators
      assert(graft.operators.Similarity.reportPqCodes(byName).collect()
        .sameElements(graft.operators.Similarity.pqEncode(emb).collect()),
        "catalog round trip must preserve the codes exactly")
      assert(graft.operators.Similarity.reportClusterSample(byName).collect()
        .sameElements(graft.operators.Similarity.clusterSample(emb).collect()),
        "the sample view must run off the catalog table")
      // a cell-scoped read prunes partitions at the scan
      val probe = graft.sources.IndexCatalog.probeCells(spark, "graft_vecreport_t", Seq(1, 3))
      val plan = probe.queryExecution.executedPlan.toString()
      assert(!plan.contains("Filter (cell"),
        "cell slices must prune partitions at the scan, not filter after it")
      assert(probe.count() ==
        graft.operators.Similarity.clusterAssign(emb)
          .filter(col("cell").isin(1, 3)).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_vecreport_t")
    }
  }

  test("operators are source-format agnostic: CSV and JSON inputs give parquet-identical results") {
    // the oracle gate runs on parquet; this pins that the same operator
    // over the same rows staged as CSV or JSON computes the same frame —
    // i.e. operators depend only on the DataFrame contract, not the source
    val docs = Tables.documents(spark, sf)
    val want = graft.operators.TextAnalysis.qualityScore(docs).collect().toSeq
    val base = java.nio.file.Files.createTempDirectory("graft_src_parity")
    val csvDir = base.resolve("csv").toString
    val jsonDir = base.resolve("json").toString
    docs.write.option("header", "true").option("quoteAll", "true").csv(csvDir)
    docs.write.json(jsonDir)
    val fromCsv = spark.read.option("header", "true")
      .schema(graft.streaming.DocStreams.docsSchema).csv(csvDir)
    val fromJson = spark.read
      .schema(graft.streaming.DocStreams.docsSchema).json(jsonDir)
    assert(graft.operators.TextAnalysis.qualityScore(fromCsv).collect().toSeq == want,
      "CSV-sourced result differs from parquet")
    assert(graft.operators.TextAnalysis.qualityScore(fromJson).collect().toSeq == want,
      "JSON-sourced result differs from parquet")
    // a multi-pass operator too: the mixture report re-scans its input
    // (stats pass + apply pass), so it exercises source re-reads
    val mixWant = graft.operators.Corpus
      .mixtureBalance(docs, Seq("src0" -> 2000), 500).collect().toSeq
    assert(graft.operators.Corpus.mixtureBalance(fromCsv, Seq("src0" -> 2000), 500)
      .collect().toSeq == mixWant, "CSV-sourced mixture report differs from parquet")
    assert(graft.operators.Corpus.mixtureBalance(fromJson, Seq("src0" -> 2000), 500)
      .collect().toSeq == mixWant, "JSON-sourced mixture report differs from parquet")
  }

  test("orc round trip is value-exact and pushes filters to the scan") {
    val dir = tmp("graft_orc")
    val docs = Tables.documents(spark, sf)
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.schema(docs.schema).orc(dir)
    assert(back.collect().toSeq.sortBy(_.getLong(0)) ==
      docs.collect().toSeq.sortBy(_.getLong(0)), "ORC round trip must be lossless")
    // the columnar reader must receive the predicate and the pruned schema
    val plan = back.filter(col("doc_id") < 100).select("doc_id", "lang")
      .queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)]"),
      s"doc_id predicate should reach the ORC scan, got:\n${plan.take(1200)}")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      "projection should prune the ORC read schema to the two selected columns")
  }
}

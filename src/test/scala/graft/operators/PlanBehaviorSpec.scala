package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.etl.{Bronze, Silver}
import graft.sources.Lake

/** Plan-level behavior the engine's scale story depends on, asserted
  * rather than assumed: AQE skew-join splitting engages under the
  * shipped session config, and the partitioned lake layout prunes
  * partitions at the scan. */
class PlanBehaviorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE splits a pathologically skewed join under the shipped config") {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // make skew detection trip on small data
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    import s.implicits._
    // one hot key carrying ~100k fat rows vs uniform rest
    val fact = s.range(0, 110000).select(
      when(col("id") < 100000, 0L).otherwise(col("id") % 64).as("k"),
      concat(lit("x"), col("id").cast("string"),
        lit("payloadpayloadpayloadpayloadpayload")).as("payload"))
    val dim = s.range(0, 64).select(col("id").as("k"), col("id").as("v"))
    val joined = fact.join(dim, "k")
    // execute through THIS Dataset's QueryExecution (df.write would
    // spawn a separate one and leave this plan un-run)
    joined.collect()
    val adaptive = joined.queryExecution.executedPlan.collectFirst {
      case a: AdaptiveSparkPlanExec => a
    }
    assert(adaptive.isDefined, "expected an adaptive plan")
    val finalPlan = adaptive.get.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"expected AQE skew-join split in final plan:\n$finalPlan")
  }

  test("partition filters prune the partitioned silver layout at the scan") {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "prune").toString
    val silver = Silver.fromBronze(
      Bronze.fromRaw(PipelineQueries.rawBooks(spark, TestSpark.sf)), "t")
    Lake.writeParquetPartitioned(silver, dir, Seq("category"))
    val someCategory = silver.select("category").head().getString(0)
    val q = Lake.readParquet(spark, dir).filter(col("category") === someCategory)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains(someCategory.replace("#", "")) ||
      scan.contains(s"category=$someCategory") ||
      scan.contains("PartitionFilters: [isnotnull(category"),
      s"expected partition pruning in:\n$scan")
    // and the pruned read returns exactly that partition's rows
    assert(q.count() == silver.filter(col("category") === someCategory).count())
  }

  test("q55's hash gate evaluates as a filter directly over a pruned scan") {
    val plan = CurationQueries.queries("q55_stratified_sample")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    // the sampling gate must be map-side: a Filter above the scan, with
    // only the three referenced columns read
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,source:string,n_chars:bigint>"),
      s"expected a 3-column pruned scan in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "no join belongs in the sampling gate")
  }

  test("q64's weighted top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = CurationQueries.queries("q64_weighted_sample")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator in:\n$plan")
    assert(!plan.split("TakeOrderedAndProject").last.contains("Exchange"),
      "no shuffle belongs under the top-k")
  }

  test("q13-style top-k and q20 exact kNN still plan as TakeOrderedAndProject") {
    Seq("q13_topk", "q20_knn_exact").foreach { name =>
      val plan = graft.SparkEntry.queries(name)(spark, TestSpark.sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"), s"$name lost its top-k plan:\n$plan")
    }
  }

  test("q116's filter reaches the vector scan as a pushed parquet predicate") {
    val plan = graft.SparkEntry.queries("q116_filtered_knn_exact")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"q116 lost its top-k plan:\n$plan")
    assert(plan.contains("In(label, [2,3])"),
      s"q116's label predicate must push into the parquet scan:\n$plan")
  }

  test("a versioned snapshot read scans ONLY the manifest's file list") {
    import graft.sources.Versioned
    val s = spark
    import s.implicits._
    val t = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "vt_plan").toString
    Versioned.commit(s, t, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Some("k"), 2)
    Versioned.commit(s, t, Seq((3L, "c")).toDF("k", "v"), Some("k"), 1)
    val manifest1 = Versioned.snapshot(s, t, 1).files
      .map(f => java.nio.file.Paths.get(t, f.path).toAbsolutePath.normalize.toString)
      .toSet
    val scanned = Versioned.read(s, t, 1).inputFiles
      .map(f => new java.net.URI(f).getPath).toSet
    assert(scanned == manifest1,
      s"v1 scan must bind to exactly the v1 manifest:\n$scanned\nvs\n$manifest1")
    // and no directory-listing leakage from the later commit
    val all = Versioned.read(s, t, 2).inputFiles.toSet
    assert(all.size == 1, "v2 replaced nothing — its manifest lists only its own file")
  }

  test("q77's range read scans only the files whose stats intersect the range") {
    import graft.sources.Versioned
    val s = spark
    import s.implicits._
    val t = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "vt_skip").toString
    // range-partitioned on k across 8 files ⇒ [min,max] per file are
    // narrow and disjoint; a tight key range must resolve to ONE file
    Versioned.commit(s, t, (1L to 800L).map(k => (k, k % 7)).toDF("k", "g"),
      Some("k"), files = 8)
    val pruned = Versioned.readKeyRange(s, t, lo = 150L, hi = 160L)
    assert(pruned.inputFiles.length == 1,
      s"8-file range layout + 11-key range must scan 1 file, " +
        s"got ${pruned.inputFiles.length}")
    assert(pruned.count() == 11)
  }

  test("x03's fact scan carries a dynamic partition pruning filter") {
    val q = PipelineQueries.queries("x03_dpp_join")(spark, TestSpark.sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"expected a DPP filter on the partitioned fact scan in:\n$plan")
  }

  test("k-means assignment is a pure map: no join, no shuffle before the output sort") {
    import graft.vector.KMeans
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf)
    val model = KMeans.centroids(emb, k = 4, iters = 1)
    val plan = KMeans.assignTo(emb, model).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"assignment must not join:\n$plan")
    assert(!plan.contains("Exchange"), s"assignment must not shuffle:\n$plan")
    assert(plan.contains("vec_l2"),
      s"distances must run through the codegen'd expression:\n$plan")
  }

  test("q108 snippets plan as TakeOrderedAndProject over one projected scan") {
    val plan = graft.SparkEntry.queries("q108_search_snippets")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k in:\n$plan")
    assert(!plan.contains("Exchange"),
      s"snippet generation is map-side + top-k; no shuffle belongs here:\n$plan")
  }
}

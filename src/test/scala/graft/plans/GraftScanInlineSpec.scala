package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins for [[GraftScanInline]] — the optimizer rule that splices the
  * native file-scan plan in place of a catalog (DSv2) read of a graft
  * table, so the SQL door plans exactly like the library path:
  *   - pushed filters reach the parquet scan (manifest file skipping +
  *     row-group pruning), column pruning reaches `ReadSchema`;
  *   - manifest statistics make a small graft table STATICALLY
  *     broadcast-able (the V1Scan fallback bridge reports no stats, so
  *     without the inline a catalog join can never broadcast);
  *   - `SELECT count(*)` folds to the manifest row sum (the
  *     [[MetadataOnlyCount]] rewrite fires through the door);
  *   - time travel stays pinned, commands (DELETE, ADD CONSTRAINT)
  *     keep their un-inlined relation child and still work. */
class GraftScanInlineSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.sigraft", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.sigraft.warehouse",
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get("target", "sigraft_wh")).toString)
    s
  }
  import spark.implicits._

  private def uniq(tag: String): String =
    tag + "_" + java.util.UUID.randomUUID().toString.replace("-", "").take(10)

  private def mkTable(rows: Int): String = {
    val t = uniq("si")
    spark.sql(s"CREATE TABLE sigraft.$t (k BIGINT, grp BIGINT, v STRING) " +
      "TBLPROPERTIES ('key' = 'k')")
    (1 to rows).map(i => (i.toLong, (i % 7).toLong, s"v$i"))
      .toDF("k", "grp", "v").createOrReplaceTempView(s"${t}_src")
    spark.sql(s"INSERT INTO sigraft.$t SELECT * FROM ${t}_src")
    t
  }

  test("filter + projection through the SQL door hit the native scan") {
    val t = mkTable(400)
    val df = spark.sql(s"SELECT v FROM sigraft.$t WHERE k = 37")
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("VersionedFileIndex"),
      "the native file index plans the scan, not the V1Scan bridge")
    assert(!phys.contains("V1ScanWrapper") && !phys.contains("BatchScan"),
      s"no DSv2 bridge node survives:\n$phys")
    assert(phys.contains("PushedFilters: [IsNotNull(k), EqualTo(k,37)]"),
      s"the predicate reached the parquet reader:\n$phys")
    assert(phys.contains("ReadSchema: struct<k:bigint,v:string>"),
      s"untouched column grp pruned from the scan:\n$phys")
    assert(df.as[String].collect().toSeq == Seq("v37"))
  }

  test("manifest statistics statically broadcast a small catalog table") {
    val t = mkTable(300)
    // big probe side: 2M rows ≈ 16 MB estimated, over the 10 MB
    // auto-broadcast threshold, so only the graft side is eligible
    spark.range(0, 2000000).selectExpr("id", "id % 300 AS k")
      .createOrReplaceTempView(s"${t}_big")
    val df = spark.sql(
      s"SELECT b.id, t.v FROM ${t}_big b JOIN sigraft.$t t ON b.k = t.k")
    // sparkPlan is the STATIC plan (AQE has not executed anything yet):
    // broadcast chosen here proves the stats flowed, not a runtime fixup
    val phys = df.queryExecution.sparkPlan.toString
    assert(phys.contains("BroadcastHashJoin"),
      s"static plan broadcasts the graft side:\n$phys")
    // id % 300 ∈ [0,299], table keys ∈ [1,300]: the 6667 k=0 probe rows
    // have no match, everything else joins exactly once
    assert(df.count() == 1993333L)
  }

  test("count(*) through the door folds to the manifest row sum") {
    val t = mkTable(250)
    val df = spark.sql(s"SELECT count(*) AS n FROM sigraft.$t")
    assert(df.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.isInstanceOf[LocalRelation]),
      "MetadataOnlyCount fired through the catalog read")
    assert(df.as[Long].head() == 250L)
  }

  test("time travel stays pinned through the inline") {
    val t = uniq("si_tt")
    spark.sql(s"CREATE TABLE sigraft.$t (k BIGINT) TBLPROPERTIES ('key'='k')")
    spark.sql(s"INSERT INTO sigraft.$t VALUES (1), (2), (3)")
    spark.sql(s"INSERT OVERWRITE sigraft.$t VALUES (9)")
    assert(spark.sql(s"SELECT k FROM sigraft.$t VERSION AS OF 2 ORDER BY k")
      .as[Long].collect().toSeq == Seq(1L, 2L, 3L))
    assert(spark.sql(s"SELECT k FROM sigraft.$t").as[Long].head() == 9L)
  }

  test("commands keep their relation child: DELETE and ADD CONSTRAINT work") {
    val t = uniq("si_cmd")
    spark.sql(s"CREATE TABLE sigraft.$t (k BIGINT, cents BIGINT) " +
      "TBLPROPERTIES ('key'='k')")
    spark.sql(s"INSERT INTO sigraft.$t VALUES (1, 50), (2, 150), (3, 250)")
    // DELETE pattern-matches its V2 relation child — must not be inlined
    spark.sql(s"DELETE FROM sigraft.$t WHERE k = 1")
    assert(spark.sql(s"SELECT count(*) AS n FROM sigraft.$t")
      .as[Long].head() == 2L)
    // ADD CONSTRAINT validates existing data via the relation child;
    // violating rows must surface the CONSTRAINT error, not a planner one
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE sigraft.$t " +
        "ADD CONSTRAINT cents_big CHECK (cents >= 200)")
    }
    assert(e.getMessage.toLowerCase.contains("check"),
      s"constraint violation surfaced, not a planning failure: ${e.getMessage}")
    // a satisfiable constraint lands and gates a later bad write
    spark.sql(s"ALTER TABLE sigraft.$t " +
      "ADD CONSTRAINT cents_pos CHECK (cents >= 100)")
    intercept[Exception] {
      spark.sql(s"INSERT INTO sigraft.$t VALUES (4, 10)")
    }
  }

  test("bare-catalog scan builder pushes filters and prunes columns") {
    // extension sessions inline every catalog read, so the V1 bridge
    // builder is only reachable WITHOUT GraftExtensions — drive it by
    // hand the way V2ScanRelationPushDown would in such a session
    import org.apache.spark.sql.connector.read.{SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
    import org.apache.spark.sql.sources.{BaseRelation, EqualTo, TableScan}
    val t = mkTable(200)
    val wh = spark.conf.get("spark.sql.catalog.sigraft.warehouse")
    val gt = new graft.sources.GraftTable(s"$wh/$t", t, -1L)
    val sb = gt.newScanBuilder(new org.apache.spark.sql.util
      .CaseInsensitiveStringMap(java.util.Collections.emptyMap()))
    val pf = sb.asInstanceOf[SupportsPushDownFilters]
    // every filter comes back residual (file skipping is pruning, not
    // exact evaluation) but the translatable one is retained as pushed
    val residual = pf.pushFilters(Array(EqualTo("k", 37L)))
    assert(residual.length == 1 && pf.pushedFilters().length == 1)
    val full = gt.schema()
    sb.asInstanceOf[SupportsPushDownRequiredColumns].pruneColumns(
      org.apache.spark.sql.types.StructType(
        Seq(full("k"), full("v"))))
    val scan = sb.build()
    assert(scan.readSchema().fieldNames.toSeq == Seq("k", "v"))
    val rel = scan.asInstanceOf[V1Scan]
      .toV1TableScan[BaseRelation with TableScan](spark.sqlContext)
    assert(rel.schema.fieldNames.toSeq == Seq("k", "v"))
    assert(rel.buildScan().count() == 1L)
  }

  test("bare-catalog pruneColumns: case-ambiguous name falls back to the full schema") {
    // a table whose columns differ only in case makes an insensitive
    // name match AMBIGUOUS; binding .find's first hit would silently
    // serve the wrong field through the V1 bridge — the builder must
    // fall back to the full schema instead (the inline rule already
    // bails out on the same ambiguity)
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
    val wh = spark.conf.get("spark.sql.catalog.sigraft.warehouse")
    val t = uniq("si_case")
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("K", LongType), StructField("v", StringType)))
    val df = spark.createDataFrame(
      java.util.Collections.singletonList(
        org.apache.spark.sql.Row(1L, 2L, "x")), schema)
    // such a table can only be WRITTEN by a case-sensitive session
    // (the parquet writer refuses duplicate-insensitive names
    // otherwise); the read side below runs under the default
    // insensitive resolver, where the ambiguity bites
    spark.conf.set("spark.sql.caseSensitive", "true")
    try graft.sources.Versioned.commit(spark, s"$wh/$t", df, None, 1)
    finally spark.conf.set("spark.sql.caseSensitive", "false")
    val gt = new graft.sources.GraftTable(s"$wh/$t", t, -1L)
    val empty = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Collections.emptyMap())
    // ambiguous requirement ("K" matches both k and K insensitively)
    val sb1 = gt.newScanBuilder(empty)
    sb1.asInstanceOf[SupportsPushDownRequiredColumns].pruneColumns(
      StructType(Seq(StructField("K", LongType))))
    assert(sb1.build().readSchema().fieldNames.toSeq == Seq("k", "K", "v"),
      "ambiguity must widen to the full schema, never bind a guess")
    // unambiguous requirement still prunes
    val sb2 = gt.newScanBuilder(empty)
    sb2.asInstanceOf[SupportsPushDownRequiredColumns].pruneColumns(
      StructType(Seq(StructField("v", StringType))))
    assert(sb2.build().readSchema().fieldNames.toSeq == Seq("v"))
    // under a case-SENSITIVE resolver the same requirement is exact:
    // "K" binds the K field, never its lowercase sibling
    spark.conf.set("spark.sql.caseSensitive", "true")
    try {
      val sb3 = gt.newScanBuilder(empty)
      sb3.asInstanceOf[SupportsPushDownRequiredColumns].pruneColumns(
        StructType(Seq(StructField("K", LongType))))
      assert(sb3.build().readSchema().fieldNames.toSeq == Seq("K"))
    } finally spark.conf.set("spark.sql.caseSensitive", "false")
  }

  test("non-literal initial DEFAULT reads through the door") {
    // the stored default is constant-FOLDABLE but not a literal —
    // nvl() is RuntimeReplaceable, which only the optimizer's Finish
    // Analysis batch rewrites; the inline must splice a plan that has
    // already been through it, or the expression reaches execution
    // unevaluable (the V1 bridge re-optimized the inner plan from
    // scratch, hiding the hazard)
    val t = uniq("si_def")
    spark.sql(s"CREATE TABLE sigraft.$t (k BIGINT) TBLPROPERTIES ('key'='k')")
    spark.sql(s"INSERT INTO sigraft.$t VALUES (1), (2)")
    spark.sql(s"ALTER TABLE sigraft.$t ADD COLUMN d BIGINT DEFAULT nvl(7, 5)")
    spark.sql(s"INSERT INTO sigraft.$t (k, d) VALUES (3, 9)")
    assert(spark.sql(s"SELECT k, d FROM sigraft.$t ORDER BY k")
      .as[(Long, Long)].collect().toSeq ==
      Seq((1L, 7L), (2L, 7L), (3L, 9L)))
  }

  test("current_user() default evaluates through the door") {
    // CurrentUser (like current_database/current_catalog) is an
    // unevaluable placeholder until the Finish-Analysis family's
    // ReplaceCurrentLike folds it; the splice must apply that rule
    // too, or a stored default using it reaches execution unevaluable
    // (the V1 bridge re-optimized the inner plan from scratch and so
    // handled it by accident)
    val t = uniq("si_user")
    spark.sql(s"CREATE TABLE sigraft.$t (k BIGINT) TBLPROPERTIES ('key'='k')")
    spark.sql(s"INSERT INTO sigraft.$t VALUES (1), (2)")
    spark.sql(s"ALTER TABLE sigraft.$t " +
      "ADD COLUMN u STRING DEFAULT current_user()")
    // outer current_user() folds in the real Finish Analysis batch;
    // the stored default's folds in the splice — they must agree
    assert(spark.sql(s"SELECT count(*) AS n FROM sigraft.$t " +
      "WHERE u = current_user()").as[Long].head() == 2L)
  }

  test("current_timestamp default folds to ONE instant across references") {
    // a time-dependent stored default is folded by ComputeCurrentTime
    // ONCE per rule application, so two scans of the same table see
    // the same instant — per-reference folding would give each side
    // of the self-join a different microsecond and drop every
    // pre-existing row from its own equality join
    val t = uniq("si_now")
    spark.sql(s"CREATE TABLE sigraft.$t (k BIGINT) TBLPROPERTIES ('key'='k')")
    spark.sql(s"INSERT INTO sigraft.$t SELECT id FROM range(20)")
    spark.sql(s"ALTER TABLE sigraft.$t " +
      "ADD COLUMN ts TIMESTAMP DEFAULT current_timestamp()")
    assert(spark.sql(s"SELECT count(*) AS n FROM sigraft.$t x " +
      s"JOIN sigraft.$t y ON x.k = y.k WHERE x.ts = y.ts")
      .as[Long].head() == 20L)
  }

  test("one query shares one loaded table across outer plan and subqueries") {
    // the snapshot pin rides the analyzer's per-query relation cache:
    // every reference to the same latest table — outer scan, scalar
    // subquery — resolves to the SAME loaded instance, so all of them
    // read the version resolved at load and a commit racing the
    // planning cannot split the query across versions
    val t = mkTable(50)
    val df = spark.sql(s"SELECT count(*) AS n FROM sigraft.$t " +
      s"WHERE k > (SELECT max(k) - 5 FROM sigraft.$t)")
    val tables = df.queryExecution.analyzed.collectWithSubqueries {
      case r: org.apache.spark.sql.execution.datasources.v2
        .DataSourceV2Relation => r.table
    }
    assert(tables.size == 2, s"both references found: $tables")
    assert(tables.head eq tables(1),
      "analysis resolved one shared table instance for both references")
    assert(df.as[Long].head() == 5L)
  }

  test("self-join of latest reads pins ONE version per query") {
    val t = uniq("si_pin")
    spark.sql(s"CREATE TABLE sigraft.$t (k BIGINT, tag STRING) " +
      "TBLPROPERTIES ('key' = 'k')")
    spark.sql(s"INSERT INTO sigraft.$t SELECT id, 'a' FROM range(100)")
    val df = spark.sql(s"SELECT count(*) AS n FROM sigraft.$t x " +
      s"JOIN sigraft.$t y ON x.k = y.k WHERE x.tag = y.tag")
    // the overwrite lands AFTER the query resolved, BEFORE first
    // execution: both sides read the version pinned AT LOAD (100 'a'
    // rows — Iceberg-style analysis-time snapshot), never a torn mix
    // of versions (which would join 'a' rows against 'b' rows → 0)
    // and never a planning-time race. A fresh statement sees the
    // overwrite.
    spark.sql(s"INSERT OVERWRITE sigraft.$t SELECT id, 'b' FROM range(50)")
    assert(df.as[Long].head() == 100L)
    assert(spark.sql(s"SELECT count(*) AS n FROM sigraft.$t x " +
      s"JOIN sigraft.$t y ON x.k = y.k WHERE x.tag = y.tag")
      .as[Long].head() == 50L)
  }

  test("runtime bloom filters inject over the inlined graft scan") {
    // the shuffle-join scale path: a graft fact too big to broadcast,
    // joined to a filtered dim — InjectRuntimeFilter only fires over a
    // plain LogicalRelation (the V1ScanWrapper bridge blocked it), so
    // this pins that the inline restores it. Thresholds are lowered in
    // a THROWAWAY session because the fixture is tiny; at warehouse
    // scale the default 10 GB application-side floor is met naturally.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.sigraft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.sigraft.warehouse",
      spark.conf.get("spark.sql.catalog.sigraft.warehouse"))
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    val t = uniq("si_rtf")
    s2.range(0, 20000)
      .selectExpr("id AS k", "id % 500 AS dim_k", "id * 3 AS v")
      .createOrReplaceTempView(s"${t}_src")
    s2.sql(s"CREATE TABLE sigraft.$t TBLPROPERTIES ('key' = 'k') " +
      s"AS SELECT * FROM ${t}_src")
    // d_attr must NOT be algebraically derivable from the join key, or
    // constraint propagation replaces the bloom with an exact filter
    s2.range(0, 500)
      .selectExpr("id AS d_k", "pmod(xxhash64(id), 50) AS d_attr")
      .createOrReplaceTempView(s"${t}_dim")
    val df = s2.sql(s"SELECT sum(f.v) AS s FROM sigraft.$t f " +
      s"JOIN ${t}_dim d ON f.dim_k = d.d_k WHERE d.d_attr = 7")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("might_contain") || opt.contains("bloom_filter_agg"),
      s"a runtime bloom filter guards the graft fact scan:\n$opt")
    val expected = s2.table(s"${t}_src").as("f")
      .join(s2.table(s"${t}_dim").as("d"), $"f.dim_k" === $"d.d_k")
      .where($"d.d_attr" === 7)
      .agg(org.apache.spark.sql.functions.sum($"f.v")).head.getLong(0)
    assert(df.head.getLong(0) == expected)
  }

  test("reads inside write commands and subqueries inline too") {
    val t = mkTable(120)
    val dst = uniq("si_dst")
    spark.sql(s"CREATE TABLE sigraft.$dst (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('key'='k')")
    // V2WriteCommand child: the query side reads a graft table
    spark.sql(s"INSERT INTO sigraft.$dst " +
      s"SELECT k, v FROM sigraft.$t WHERE k <= 10")
    assert(spark.sql(s"SELECT count(*) AS n FROM sigraft.$dst")
      .as[Long].head() == 10L)
    // scalar subquery over a graft table
    assert(spark.sql(
      s"SELECT count(*) AS n FROM sigraft.$t " +
        s"WHERE k > (SELECT max(k) - 5 FROM sigraft.$t)")
      .as[Long].head() == 5L)
  }
}

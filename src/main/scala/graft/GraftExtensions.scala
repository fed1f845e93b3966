package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{SimHashAgg, VectorCosineSim, VectorDot, VectorL2Distance, VectorL2Norm}

/** SparkSessionExtensions entry point: registers graft's custom
  * Catalyst expressions in the SQL function registry, so the SQL front
  * door reaches them (`SELECT vec_cosine_sim(a, b) ...`) exactly like
  * the Column API — one engine surface, two dialects. Wire with
  * `.withExtensions(new GraftExtensions)` (Sessions.local does) or
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * Four injection kinds and no more: scalar/aggregate expressions,
  * table-valued functions over the versioned format (`graft_table`,
  * `graft_history`, `graft_files` — SQL time travel with the same
  * manifest file-skipping as the Column API), ONE optimizer rule
  * ([[graft.plans.MetadataOnlyCount]] — global count(*) over a
  * versioned scan folds to the manifest's row sum, Delta's
  * OptimizeMetadataOnlyQuery move), and ONE resolution rule
  * ([[graft.plans.GraftDmlRewrite]] — UPDATE/MERGE INTO over a graft
  * catalog table become RunnableCommands, Delta's MergeIntoCommand
  * pattern). SURVEY §4.2's conclusion — no custom physical plans or
  * strategies — still holds: the TVFs resolve to plans built from
  * EXISTING relations (VersionedScan's HadoopFsRelation), the
  * optimizer rule only REPLACES a subtree with a LocalRelation, and
  * the DML commands plan through the stock ExecutedCommandExec;
  * Catalyst plans everything with stock operators.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Optimizer rule: global COUNT(*) over a versioned scan collapses
    // to the manifest's precomputed row sum (Delta's
    // OptimizeMetadataOnlyQuery move) — see graft.plans.MetadataOnlyCount.
    ext.injectOptimizerRule(graft.plans.MetadataOnlyCount.apply)
    // Optimizer rule: catalog reads of graft tables inline the native
    // file-scan plan (Delta's relation-inline move) — restores exact
    // manifest statistics (auto-broadcast), metadata-only aggregates
    // and full pushdown that the V1Scan fallback bridge hides — see
    // graft.plans.GraftScanInline.
    ext.injectOptimizerRule(graft.plans.GraftScanInline.apply)
    // Resolution rule: UPDATE / MERGE INTO over a graft catalog table
    // rewrite to RunnableCommands orchestrating one atomic
    // copy-on-write commit each (Delta's MergeIntoCommand pattern) —
    // see graft.plans.GraftDmlRewrite. DELETE FROM needs no rule: the
    // table implements SupportsDeleteV2, Spark's native hook.
    ext.injectResolutionRule(_ => new graft.plans.GraftDmlRewrite)
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float/double arrays"),
      (args: Seq[Expression]) => VectorDot(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("vec_l2"),
      info("vec_l2", "vec_l2(a, b) - Euclidean distance between two arrays"),
      (args: Seq[Expression]) => VectorL2Distance(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("vec_cosine_sim"),
      info("vec_cosine_sim", "vec_cosine_sim(a, b) - cosine similarity in [-1, 1]"),
      (args: Seq[Expression]) => VectorCosineSim(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("vec_norm"),
      info("vec_norm", "vec_norm(a) - L2 norm of an array"),
      (args: Seq[Expression]) => VectorL2Norm(args(0))))
    ext.injectFunction((FunctionIdentifier("simhash_agg"),
      info("simhash_agg", "simhash_agg(h) - 60-bit SimHash over 64-bit token hashes"),
      (args: Seq[Expression]) => SimHashAgg(args(0)).toAggregateExpression()))
    // Spark ships Bloom-filter expressions for its internal runtime
    // filters but does not register them publicly; exposing them makes
    // the sketch-accelerated join pattern (build on the small side,
    // pre-filter the big side before the shuffle) directly expressible
    // — see q47.
    ext.injectFunction((FunctionIdentifier("bloom_filter_agg"),
      info("bloom_filter_agg",
        "bloom_filter_agg(xxhash64(x), estItems, numBits) - build a Bloom filter"),
      (args: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          args(0), args(1), args(2)).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("might_contain"),
      info("might_contain",
        "might_contain(bf, xxhash64(x)) - probabilistic membership; false negatives never occur"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          args(0), args(1))))
    // Curation primitives, as raw Catalyst trees (a Column built from
    // `functions._` wraps unresolved ColumnNodes that cannot embed in a
    // registry builder — the analyzer never descends into them). Parity
    // with the Column-API versions (CurationQueries.mdBucket,
    // ZOrder.interleave16) is pinned in ZOrderSpec; q59 gates the SQL
    // path against DuckDB.
    ext.injectFunction((FunctionIdentifier("md_bucket"),
      info("md_bucket",
        "md_bucket(key) - deterministic md5 hash bucket in [0, 1000); the reproducible sampling gate"),
      (args: Seq[Expression]) => CurationExprs.mdBucket(args(0))))
    ext.injectFunction((FunctionIdentifier("zorder_key"),
      info("zorder_key",
        "zorder_key(a, b) - Morton interleave of the low 16 bits of two non-negative ints"),
      (args: Seq[Expression]) => CurationExprs.interleave16(args(0), args(1))))

    // Table-valued functions: the SQL front door to the versioned
    // table format. `graft_table` resolves to the SAME
    // VersionedFileIndex-backed relation the Column API reads
    // (VersionedScan.read), so SQL `WHERE` predicates prune manifest
    // files in-plan exactly like df.filter — pinned in SqlTvfSpec.
    // The second argument is `VERSION AS OF` (integer) or `TIMESTAMP
    // AS OF` (timestamp literal, resolved through the commit-ts walk
    // in Versioned.snapshotAsOf). Arguments must be foldable — they
    // are evaluated at resolution time, which is also when the
    // manifest is pinned (snapshot isolation: a concurrent commit
    // cannot shift an already-resolved query).
    ext.injectTableFunction((FunctionIdentifier("graft_table"),
      info("graft_table",
        "graft_table(path[, version|timestamp]) - versioned-table snapshot as a relation with manifest file-skipping"),
      (args: Seq[Expression]) => GraftTvfs.table(args)))
    ext.injectTableFunction((FunctionIdentifier("graft_history"),
      info("graft_history",
        "graft_history(path) - the table's commit log (DESCRIBE HISTORY)"),
      (args: Seq[Expression]) => GraftTvfs.history(args)))
    ext.injectTableFunction((FunctionIdentifier("graft_files"),
      info("graft_files",
        "graft_files(path[, version]) - the snapshot's manifest as rows (file, rows, bytes, per-column stats)"),
      (args: Seq[Expression]) => GraftTvfs.files(args)))
    ext.injectTableFunction((FunctionIdentifier("graft_branches"),
      info("graft_branches",
        "graft_branches(path) - branch inventory (branch, fork_version, head_version)"),
      (args: Seq[Expression]) => GraftTvfs.branches(args)))
    ext.injectTableFunction((FunctionIdentifier("graft_tags"),
      info("graft_tags",
        "graft_tags(path) - tag inventory (tag, version)"),
      (args: Seq[Expression]) => GraftTvfs.tags(args)))
    ext.injectTableFunction((FunctionIdentifier("graft_diff"),
      info("graft_diff",
        "graft_diff(path, key, fromVersion, toVersion) - keyed change feed (table_changes) as rows"),
      (args: Seq[Expression]) => GraftTvfs.diff(args)))
    ext.injectTableFunction((FunctionIdentifier("graft_scd2"),
      info("graft_scd2",
        "graft_scd2(path, key) - the commit log's SCD2 expansion: one row per (key, value-state) with [valid_from, valid_to) version bounds"),
      (args: Seq[Expression]) => GraftTvfs.scd2(args)))
    ext.injectTableFunction((FunctionIdentifier("graft_repo"),
      info("graft_repo",
        "graft_repo(path[, repoVersion]) - the repo pointer as rows (member, version)"),
      (args: Seq[Expression]) => GraftTvfs.repo(args)))
    ext.injectTableFunction((FunctionIdentifier("graft_row_ids"),
      info("graft_row_ids",
        "graft_row_ids(path[, version]) - snapshot rows plus the stable _row_id (row tracking: manifest baseRowId + in-file position)"),
      (args: Seq[Expression]) => GraftTvfs.rowIds(args)))
    ext.injectTableFunction((FunctionIdentifier("graft_repo_table"),
      info("graft_repo_table",
        "graft_repo_table(path, member[, repoVersion]) - a member table pinned by the repo pointer"),
      (args: Seq[Expression]) => GraftTvfs.repoTable(args)))
    ext.injectTableFunction((FunctionIdentifier("graft_ann_search"),
      info("graft_ann_search",
        "graft_ann_search(indexRoot, tablePath, idCol, embCol, probeId | array(probeIds), k[, nProbe][, kind]) - approximate top-k over a COMMITTED ANN index (CALL graft.system.ann_ensure builds it); kind 'ivf' (default) | 'pq' | 'hnsw' — every kind ann_ensure can build is servable; probes are the embeddings of the named rows, and an ARRAY of ids serves the whole set through one batch plan (result gains a probe_id column)"),
      (args: Seq[Expression]) => GraftTvfs.annSearch(args)))
  }
}

/** Builders behind the graft_* table-valued functions: evaluate the
  * foldable SQL arguments, delegate to the versioned read paths, and
  * hand the analyzer the resulting logical plan. */
private[graft] object GraftTvfs {
  import org.apache.spark.sql.{GraftShims, SparkSession}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.types.{StringType, TimestampType, TimestampNTZType}

  import graft.sources.{Branches, Versioned, VersionedScan}

  private def arg(e: Expression, what: String): Any = {
    require(e.foldable, s"graft TVF $what argument must be a literal")
    e.eval()
  }

  private def pathOf(args: Seq[Expression]): String =
    String.valueOf(arg(args.head, "path"))

  def table(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty && args.size <= 2,
      "usage: graft_table(path[, version|timestamp|tag])")
    val spark = SparkSession.active
    val path = pathOf(args)
    val df = if (args.size == 1) VersionedScan.read(spark, path)
    else args(1).dataType match {
      case TimestampType | TimestampNTZType =>
        // timestamp literals eval to epoch MICROseconds
        val ver = Versioned.snapshotAsOf(spark, path,
          arg(args(1), "timestamp").asInstanceOf[Long] / 1000L).version
        VersionedScan.read(spark, path, ver)
      case StringType =>
        // a string second argument is a TAG — the immutable named
        // version pointer (Branches.tag); resolution is one tiny
        // metadata read, then the same pinned-manifest scan
        val ver = Branches.tagVersion(spark, path,
          String.valueOf(arg(args(1), "tag")))
        VersionedScan.read(spark, path, ver)
      case _ =>
        VersionedScan.read(spark, path,
          arg(args(1), "version").asInstanceOf[Number].longValue)
    }
    GraftShims.logicalPlan(df)
  }

  def scd2(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 2, "usage: graft_scd2(path, key)")
    val spark = SparkSession.active
    GraftShims.logicalPlan(Versioned.dimensionHistory(spark, pathOf(args),
      String.valueOf(arg(args(1), "key"))))
  }

  def repo(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty && args.size <= 2,
      "usage: graft_repo(path[, repoVersion])")
    val spark = SparkSession.active
    import spark.implicits._
    val rv = if (args.size == 2)
      arg(args(1), "repoVersion").asInstanceOf[Number].longValue else -1L
    GraftShims.logicalPlan(
      graft.sources.Repo.snapshot(spark, pathOf(args), rv).toSeq.sorted
        .toDF("member", "version"))
  }

  def annSearch(args: Seq[Expression]): LogicalPlan = {
    require(args.size >= 6 && args.size <= 8,
      "usage: graft_ann_search(indexRoot, tablePath, idCol, embCol, " +
        "probeId, k[, nProbe][, kind])")
    val spark = SparkSession.active
    import org.apache.spark.sql.functions.{col, lit}
    val root = pathOf(args)
    val table = String.valueOf(arg(args(1), "tablePath"))
    val idCol = String.valueOf(arg(args(2), "idCol"))
    val embCol = String.valueOf(arg(args(3), "embCol"))
    // the probe argument is a single row id OR an array literal of
    // them (`array(0, 1, 2)` — foldable, so it evaluates at
    // resolution time like every other TVF argument)
    val probeIds: Seq[Long] = args(4).dataType match {
      case at: org.apache.spark.sql.types.ArrayType =>
        val ad = arg(args(4), "probeIds")
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        require(ad.numElements() > 0,
          "graft_ann_search: empty probe id array")
        (0 until ad.numElements()).map { i =>
          val v = ad.get(i, at.elementType)
          // a NULL element gets the same deliberate diagnostic as a
          // typo'd id, never a bare NPE
          require(v != null,
            s"graft_ann_search: NULL probe id at array position $i")
          v.asInstanceOf[Number].longValue
        }
      case _ =>
        val v = arg(args(4), "probeId")
        // the scalar form gets the same deliberate diagnostic as an
        // array element, never a bare NPE
        require(v != null, "graft_ann_search: NULL probe id")
        Seq(v.asInstanceOf[Number].longValue)
    }
    val k = arg(args(5), "k").asInstanceOf[Number].intValue
    // the optional tail is (nProbe, kind), either alone or together —
    // a STRING 7th argument is the kind (nProbe keeps its default), so
    // `..., 10, 'hnsw')` and `..., 10, 4, 'pq')` both parse; the door
    // serves every kind ann_ensure can build, not just IVF
    val (nProbe, kind) = args.size match {
      case 6 => (4, "ivf")
      case 7 => args(6).dataType match {
        case StringType =>
          (4, String.valueOf(arg(args(6), "kind")).toLowerCase)
        case _ => (arg(args(6), "nProbe").asInstanceOf[Number].intValue, "ivf")
      }
      case _ => (arg(args(6), "nProbe").asInstanceOf[Number].intValue,
        String.valueOf(arg(args(7), "kind")).toLowerCase)
    }
    val emb = VersionedScan.read(spark, table)
    import graft.vector.AnnIndex
    // one validation for both dispatch branches below — the error
    // message has a single source of truth
    if (!Set("ivf", "pq", "hnsw")(kind))
      throw new IllegalArgumentException(
        s"graft_ann_search: unknown kind '$kind' (ivf | pq | hnsw)")
    val pool = math.max(64, 8 * k)
    val result = probeIds match {
      case Seq(probeId) =>
        // search-by-row: the probe is an in-plan 1-row subquery (the
        // named row's own embedding) — no vector literal crosses the
        // SQL boundary
        val probeDf = emb.filter(col(idCol) === probeId).limit(1)
          .select(col(embCol))
        // a missing probe row must be an ERROR, not a silently empty
        // top-k (a typo'd id is indistinguishable from "no neighbors"
        // otherwise); the check is one stats-pruned 1-row lookup at
        // resolution time — serving-call cost, like the row fetch
        require(!probeDf.isEmpty,
          s"graft_ann_search: no row with $idCol = $probeId in $table")
        kind match {
          case "ivf" => AnnIndex.searchIvf(spark, root,
            emb, idCol, embCol, probeDf, embCol, k, nProbe)
          // the rerank pool scales with k (the subspace count m is
          // derived from the committed codebooks — a caller value
          // could only drift)
          case "pq" => AnnIndex.searchIvfPq(spark, root,
            emb, idCol, embCol, probeDf, embCol, m = 0, k, nProbe, pool)
          case _ => AnnIndex.searchNswBatch(spark, root,
              emb, idCol, embCol,
              probeDf.select(lit(0L).as("__pid"), col(embCol)),
              "__pid", embCol, k)
            .drop("__pid").withColumnRenamed("cos", "score")
        }
      case ids =>
        // ARRAY of probe ids = the batch door: one plan serves the
        // whole question set through the tier's probe-set path, with
        // a probe_id column prepended. Every id must resolve — a
        // silently shrunken batch is the typo'd-id hazard at set size
        val probes = emb.filter(col(idCol).isin(ids: _*))
          .select(col(idCol).cast("long").as("probe_id"), col(embCol))
        val found = probes.select("probe_id").collect().map(_.getLong(0)).toSet
        val missing = ids.filterNot(found)
        require(missing.isEmpty,
          s"graft_ann_search: no row with $idCol in " +
            s"${missing.mkString("(", ", ", ")")} in $table")
        kind match {
          case "ivf" => AnnIndex.searchIvfBatch(spark, root,
            emb, idCol, embCol, probes, "probe_id", embCol, k, nProbe)
          case "pq" => AnnIndex.searchIvfPqBatch(spark, root,
            emb, idCol, embCol, probes, "probe_id", embCol, k, nProbe, pool)
          case _ => AnnIndex.searchNswBatch(spark, root,
              emb, idCol, embCol, probes, "probe_id", embCol, k)
            .withColumnRenamed("cos", "score")
        }
    }
    GraftShims.logicalPlan(result)
  }

  def repoTable(args: Seq[Expression]): LogicalPlan = {
    require(args.size >= 2 && args.size <= 3,
      "usage: graft_repo_table(path, member[, repoVersion])")
    val spark = SparkSession.active
    val rv = if (args.size == 3)
      arg(args(2), "repoVersion").asInstanceOf[Number].longValue else -1L
    GraftShims.logicalPlan(graft.sources.Repo.read(spark, pathOf(args),
      String.valueOf(arg(args(1), "member")), rv))
  }

  def diff(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 4,
      "usage: graft_diff(path, key, fromVersion, toVersion)")
    val spark = SparkSession.active
    GraftShims.logicalPlan(Versioned.changes(spark, pathOf(args),
      arg(args(2), "fromVersion").asInstanceOf[Number].longValue,
      arg(args(3), "toVersion").asInstanceOf[Number].longValue,
      Seq(String.valueOf(arg(args(1), "key")))))
  }

  def branches(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 1, "usage: graft_branches(path)")
    val spark = SparkSession.active
    import spark.implicits._
    GraftShims.logicalPlan(
      Branches.list(spark, pathOf(args))
        .toDF("branch", "fork_version", "head_version"))
  }

  def tags(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 1, "usage: graft_tags(path)")
    val spark = SparkSession.active
    import spark.implicits._
    GraftShims.logicalPlan(
      Branches.tags(spark, pathOf(args)).toDF("tag", "version"))
  }

  def history(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 1, "usage: graft_history(path)")
    GraftShims.logicalPlan(
      Versioned.history(SparkSession.active, pathOf(args)))
  }

  def rowIds(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty && args.size <= 2,
      "usage: graft_row_ids(path[, version])")
    val version =
      if (args.size == 2) arg(args(1), "version").asInstanceOf[Number].longValue
      else -1L
    GraftShims.logicalPlan(Versioned.readWithRowIds(
      SparkSession.active, pathOf(args), version))
  }

  def files(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty && args.size <= 2,
      "usage: graft_files(path[, version])")
    val version =
      if (args.size == 2) arg(args(1), "version").asInstanceOf[Number].longValue
      else -1L
    GraftShims.logicalPlan(
      Versioned.filesTable(SparkSession.active, pathOf(args), version))
  }
}

/** Catalyst-tree twins of [[graft.operators.CurationQueries.mdBucket]]
  * and [[graft.functions.ZOrder.interleave16]] for the SQL function
  * registry. Same node-for-node shapes as what the Column API builds —
  * agreement is asserted in ZOrderSpec and oracle-gated by q59. */
private[graft] object CurationExprs {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

  def mdBucket(key: Expression): Expression =
    Remainder(
      Cast(Conv(Substring(Md5(Cast(Cast(key, StringType), BinaryType)),
        Literal(1), Literal(8)), Literal(16), Literal(10)), LongType),
      Literal(1000L))

  def interleave16(a: Expression, b: Expression): Expression = {
    val a16 = Pmod(Cast(a, LongType), Literal(65536L))
    val b16 = Pmod(Cast(b, LongType), Literal(65536L))
    (0 until 16).map { i =>
      BitwiseOr(
        ShiftLeft(BitwiseAnd(ShiftRightUnsigned(a16, Literal(i)), Literal(1L)),
          Literal(2 * i)),
        ShiftLeft(BitwiseAnd(ShiftRightUnsigned(b16, Literal(i)), Literal(1L)),
          Literal(2 * i + 1)))
    }.reduce[Expression]((x, y) => BitwiseOr(x, y))
  }
}

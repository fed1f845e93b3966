package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-table atomic commits — the cross-table transaction layer a
  * lakehouse pipeline needs when one logical change spans tables (facts
  * + their aggregate, documents + their embedding index): a REPO is a
  * directory of versioned tables plus its own commit chain of
  * '''pointer manifests''', each an atomic snapshot `{table → version}`
  * of every member table.
  *
  * The LakeFS/Nessie shape on top of [[Versioned]], with no new storage
  * primitives: a writer first lands its per-table commits (each
  * individually atomic but NOT yet visible through the repo), then
  * publishes one pointer manifest by the same create-exclusive CAS the
  * table protocol uses. Readers that resolve a repo version get a
  * CONSISTENT cross-table view — every table pinned to the version the
  * pointer recorded, immune to later commits — and a reader can never
  * observe table A's half of a transaction without table B's, because
  * visibility IS the pointer placement.
  *
  * Concurrency: `commit` targets the exact next repo slot computed from
  * the version it derived from (`expected`); a losing writer gets
  * `ConcurrentModificationException` and must re-derive, exactly like a
  * stale-base table mutation. Cost: O(tables) metadata per commit, zero
  * data I/O beyond the table commits themselves.
  */
object Repo {

  private val mapper = new ObjectMapper()
  private val PointerFile = """r(\d{8})\.json""".r

  private def pointersDir(repo: String) = new Path(repo, "_repo")

  /** Latest repo version, 0 if none. */
  def latestVersion(spark: SparkSession, repo: String): Long = {
    val dir = pointersDir(repo)
    val f = Versioned.fs(spark, repo)
    if (!f.exists(dir)) 0L
    else f.listStatus(dir).map(_.getPath.getName).collect {
      case PointerFile(n) => n.toLong
    }.foldLeft(0L)(math.max)
  }

  /** Resolve a repo pointer (default: latest) to its table→version map. */
  def snapshot(spark: SparkSession, repo: String,
      version: Long = -1L): Map[String, Long] = {
    val v = if (version > 0) version else latestVersion(spark, repo)
    require(v > 0, s"repo $repo has no commits")
    val f = Versioned.fs(spark, repo)
    val in = f.open(new Path(pointersDir(repo), f"r$v%08d.json"))
    val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    val tables = mapper.readTree(bytes).get("tables")
    tables.fields().asScala.map(e => e.getKey -> e.getValue.asLong).toMap
  }

  /** Atomically publish a consistent snapshot of the named member
    * tables. `tables` maps member name → table version to pin (use
    * [[Versioned.latestVersion]] after landing the per-table commits);
    * `expected` is the repo version this transaction derived from (0
    * for the first). Unnamed members carry forward from the expected
    * snapshot, so a transaction only lists what it touched. */
  def commit(spark: SparkSession, repo: String, tables: Map[String, Long],
      expected: Long = -1L): Long = {
    // Member names are FLAT — one path segment directly under the repo
    // root. A nested name ('idx/centroids') would resolve and read
    // fine, but vacuum's pin protection looks up pointer manifests via
    // the member's immediate parent ('<repo>/_repo') keyed by the
    // table dir's last segment; a nested member would silently fall
    // outside that protection and its pinned versions could be
    // reclaimed. Refuse up front instead of breaking pinned reads
    // later.
    // the underscore prefix is the repo's reserved metadata namespace
    // ('_repo' IS the pointer directory — a member named that would
    // interleave table data with pointer manifests). A repo that
    // committed an '_'-named member before this guard existed can
    // still READ it at its pinned versions (the check covers only new
    // pins); migrate by copying the table to an unreserved name and
    // pinning that.
    tables.keys.foreach { n =>
      require(n.nonEmpty && !n.contains("/") && !n.contains("\\") &&
          n != "." && n != ".." && !n.startsWith("_"),
        s"repo member name '$n' must be a single path segment not " +
          "starting with '_' (a directory directly under the repo root; " +
          "'_repo' and friends are reserved metadata)")
    }
    val f = Versioned.fs(spark, repo)
    val dir = pointersDir(repo)
    f.mkdirs(dir)
    val base = if (expected >= 0) expected else latestVersion(spark, repo)
    val carried: Map[String, Long] =
      if (base > 0) snapshot(spark, repo, base) else Map.empty
    val pinned = carried ++ tables
    val node = mapper.createObjectNode()
    node.put("ts", System.currentTimeMillis())
    val t = node.putObject("tables")
    pinned.toSeq.sortBy(_._1).foreach { case (n, v) => t.put(n, v) }
    val tmp = new Path(dir,
      ".tmp_" + java.util.UUID.randomUUID().toString.replace("-", "").take(16))
    val out = f.create(tmp, false)
    try out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(node)) finally out.close()
    val slot = base + 1
    // exact-slot CAS — same rationale as Versioned.publish: any
    // concurrent repo commit occupies base+1 and the collision is
    // detected atomically by the putIfAbsent, never racily by a listing
    val ok = Versioned.ManifestPublisher
      .resolve(spark, Versioned.ManifestPublisher.Auto)
      .putIfAbsent(f, tmp, new Path(dir, f"r$slot%08d.json"))
    f.delete(tmp, false)
    if (!ok) throw new java.util.ConcurrentModificationException(
      s"repo commit to $repo derived from version $base, but version " +
        s"$slot already exists: re-derive the transaction")
    slot
  }

  /** Read member `name` at repo version `repoVersion` (default:
    * latest) — the table pinned to the version the pointer recorded. */
  def read(spark: SparkSession, repo: String, name: String,
      repoVersion: Long = -1L): DataFrame = {
    val pins = snapshot(spark, repo, repoVersion)
    require(pins.contains(name),
      s"repo $repo has no member $name (members: ${pins.keys.toSeq.sorted.mkString(", ")})")
    VersionedScan.read(spark, s"$repo/$name", pins(name))
  }

  /** Member table root (pass to Versioned/Lake ops when landing the
    * per-table halves of a transaction). */
  def tableRoot(repo: String, name: String): String = s"$repo/$name"
}

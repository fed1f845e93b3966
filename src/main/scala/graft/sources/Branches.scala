package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Branches and tags over the [[Versioned]] commit log — the
  * LakeFS/Iceberg-style "git for tables" surface: fork a snapshot,
  * develop against the fork with the FULL mutation surface (MERGE,
  * DELETE, OPTIMIZE — everything that works on a table works on a
  * branch, because a branch IS a table), then merge back with the same
  * optimistic-concurrency guarantee every other mutation carries.
  *
  * Representation (no new storage concepts, only composition):
  *
  *  - A '''branch''' is a shallow [[Versioned.clone]] rooted at
  *    `<table>/_branches/<name>` — its v1 references the parent's data
  *    files BY ABSOLUTE URI (zero data copied, O(files) metadata), and
  *    a `_fork.json` records the parent version it forked from. Branch
  *    commits land under the branch root; the parent never sees them.
  *  - A '''merge''' publishes the branch head's file list onto the
  *    parent with `expected = forkVersion`: the manifest CAS detects a
  *    parent that advanced past the fork and throws
  *    `ConcurrentModificationException` — a non-fast-forward merge is
  *    REFUSED, never silently last-writer-wins (re-branch and replay,
  *    the git rebase discipline). Merge moves metadata only: O(files)
  *    manifest entries, zero data I/O, snapshot-isolated like every
  *    commit.
  *  - A '''tag''' is an immutable named version pointer in
  *    `_versions/_tags/<name>.json`, placed create-exclusive (the same
  *    putIfAbsent primitive the commit protocol rests on), so a tag can
  *    never be repointed — `readTag` is reproducible forever (while the
  *    version survives VACUUM's `keepVersions`).
  *
  * Lifetime caveat (Delta shallow-clone semantics, stated not hidden):
  * after a merge, parent manifests may reference data files that live
  * under the branch root. [[drop]] therefore refuses to delete a branch
  * whose files the parent still references unless the caller first
  * detaches (any full-rewrite commit on the parent — OPTIMIZE /
  * compactCommit — re-homes all data) or passes `force = true`.
  */
object Branches {

  private val mapper = new ObjectMapper()
  private val NameRe = "^[A-Za-z0-9][A-Za-z0-9._-]{0,63}$".r

  /** A branch's table root — pass to ANY Versioned/Lake operation. */
  def root(table: String, name: String): String = {
    require(NameRe.matches(name), s"invalid branch/tag name: $name")
    table + "/_branches/" + name
  }

  private def forkPath(table: String, name: String) =
    new Path(root(table, name), "_fork.json")
  private def tagsDir(table: String) = new Path(table, "_versions/_tags")
  private def tagPath(table: String, name: String): Path = {
    require(NameRe.matches(name), s"invalid branch/tag name: $name")
    new Path(tagsDir(table), name + ".json")
  }

  /** Fork `table`@`fromVersion` (default: latest) into branch `name`.
    * O(files) metadata; no data copied. Returns the fork version. */
  def create(spark: SparkSession, table: String, name: String,
      fromVersion: Long = -1L): Long = {
    val v = if (fromVersion > 0) fromVersion
      else Versioned.latestVersion(spark, table)
    require(v > 0, s"cannot branch $table: no commits")
    Versioned.clone(spark, table, root(table, name), v, op = "BRANCH")
    val f = Versioned.fs(spark, table)
    val node = mapper.createObjectNode()
    node.put("parent", table)
    node.put("version", v)
    val out = f.create(forkPath(table, name), false)
    try out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(node)) finally out.close()
    v
  }

  /** Whether branch `name` exists (its fork record is present). */
  def exists(spark: SparkSession, table: String, name: String): Boolean =
    Versioned.fs(spark, table).exists(forkPath(table, name))

  /** The parent version branch `name` forked from. */
  def forkVersion(spark: SparkSession, table: String, name: String): Long = {
    val f = Versioned.fs(spark, table)
    val in = f.open(forkPath(table, name))
    val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    mapper.readTree(bytes).get("version").asLong
  }

  /** Read a branch head (or a specific branch-local version). */
  def read(spark: SparkSession, table: String, name: String,
      version: Long = -1L): DataFrame =
    VersionedScan.read(spark, root(table, name), version)

  /** Fast-forward merge of branch `name` into its parent: the branch
    * head becomes the parent's next version IFF the parent still sits
    * at the fork version (the manifest CAS enforces it — a parent that
    * advanced raises ConcurrentModificationException). Metadata only:
    * branch files enter the parent manifest by absolute URI. */
  def merge(spark: SparkSession, table: String, name: String): Long = {
    val bRoot = root(table, name)
    val snap = Versioned.snapshot(spark, bRoot)
    val fork = forkVersion(spark, table, name)
    val f = Versioned.fs(spark, table)
    // Entries are re-homed into the PARENT's path domain: files the
    // branch inherited at fork become the parent's original RELATIVE
    // entries again (bit-identical, so the parent fork snapshot's
    // manifest segments carry BY NAME and the merge serializes only
    // branch-touched files); branch-local files become parent-relative
    // `_branches/<name>/data/...` paths. Nothing stays absolute, and no
    // BRANCH segment name can leak into the parent manifest — segment
    // references only resolve within their own table's _versions dir.
    val parentQ = f.makeQualified(new org.apache.hadoop.fs.Path(table)).toString + "/"
    def toParent(p: String): String = {
      val abs = f.makeQualified(Versioned.resolve(bRoot, p)).toString
      if (abs.startsWith(parentQ)) abs.stripPrefix(parentQ) else abs
    }
    val entries = snap.files.map(df => df.copy(path = toParent(df.path)))
    Versioned.publish(spark, table, snap.statsCol, entries,
      op = s"MERGE_BRANCH:$name", expected = Some(fork),
      dv = snap.dv.map(toParent),
      dvRows = snap.dvRows, schemaJson = snap.schemaJson,
      mapping = snap.mapping,
      constraints = Some(snap.constraints),
      generated = Some(snap.generated),
      baseSnapHint = Some(snap),
      segBaseOverride = Some(Versioned.snapshot(spark, table, fork)))
  }

  /** Branch inventory: (name, forkVersion, headVersion). */
  def list(spark: SparkSession, table: String): Seq[(String, Long, Long)] = {
    val dir = new Path(table, "_branches")
    val f = Versioned.fs(spark, table)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName).sorted.toSeq
      .map { n =>
        (n, forkVersion(spark, table, n),
          Versioned.latestVersion(spark, root(table, n)))
      }
  }

  /** Delete a branch. Refuses (unless `force`) when the parent's KEPT
    * manifests still reference files under the branch root — see the
    * object doc's lifetime caveat. */
  def drop(spark: SparkSession, table: String, name: String,
      force: Boolean = false): Unit = {
    val bRoot = root(table, name)
    val f = Versioned.fs(spark, table)
    if (!force) {
      val qualified = f.makeQualified(new Path(bRoot)).toString + "/"
      val latest = Versioned.latestVersion(spark, table)
      // resolve each entry against the parent root: merged manifests
      // reference branch files parent-RELATIVE (_branches/<name>/...),
      // pre-fix ones absolutely — the guard must catch both
      val referenced = latest > 0 &&
        Versioned.snapshot(spark, table).files.exists(df =>
          f.makeQualified(Versioned.resolve(table, df.path)).toString
            .startsWith(qualified))
      require(!referenced,
        s"branch $name was merged and the parent still references its " +
          "files: run a full-rewrite commit on the parent (OPTIMIZE / " +
          "compactCommit) to detach, or drop(force = true)")
    }
    f.delete(new Path(bRoot), true)
  }

  /** Tag `version` (default: latest) as `name` — immutable: the tag
    * file is placed create-exclusive, so re-tagging an existing name
    * fails instead of silently repointing. */
  def tag(spark: SparkSession, table: String, name: String,
      version: Long = -1L): Long = {
    val v = if (version > 0) version else Versioned.latestVersion(spark, table)
    require(v > 0, s"cannot tag $table: no commits")
    val f = Versioned.fs(spark, table)
    f.mkdirs(tagsDir(table))
    val node = mapper.createObjectNode()
    node.put("version", v)
    val out = f.create(tagPath(table, name), false) // create-exclusive
    try out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(node)) finally out.close()
    v
  }

  /** Resolve a tag to its pinned version. */
  def tagVersion(spark: SparkSession, table: String, name: String): Long = {
    val f = Versioned.fs(spark, table)
    val in = f.open(tagPath(table, name))
    val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    mapper.readTree(bytes).get("version").asLong
  }

  /** Read the snapshot a tag pins. */
  def readTag(spark: SparkSession, table: String, name: String): DataFrame =
    VersionedScan.read(spark, table, tagVersion(spark, table, name))

  /** Tag inventory: (name, version). */
  def tags(spark: SparkSession, table: String): Seq[(String, Long)] = {
    val dir = tagsDir(table)
    val f = Versioned.fs(spark, table)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).map(_.getPath.getName)
      .filter(_.endsWith(".json")).sorted.toSeq
      .map(n => (n.stripSuffix(".json"),
        tagVersion(spark, table, n.stripSuffix(".json"))))
  }
}

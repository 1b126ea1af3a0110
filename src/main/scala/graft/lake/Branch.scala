package graft.lake

import java.nio.file.{Files, Paths}

/** WRITE-AUDIT-PUBLISH branching (the Iceberg WAP pattern, re-expressed on
  * IceLite's linked-snapshot chain): risky ingest lands on a BRANCH — a
  * fork of the snapshot chain living under `<table>/branches/<name>` that
  * IS a table dir (every IceLite/Merge/Replay API works on it unchanged,
  * its data files land under the branch's own `data/`) — gets audited
  * there (row counts, replay-equality, whatever the caller checks), and
  * only then PUBLISHES: the branch's snapshot JSONs hard-link into main's
  * meta dir one version at a time. link(2) create-if-absent is the same
  * primitive IceLite.commit uses, so a publish racing a main commit loses
  * atomically and loudly (EEXIST on the first contested version) with main
  * uncorrupted and the branch intact; a crash mid-publish leaves main on a
  * complete earlier snapshot and a re-publish resumes idempotently.
  *
  * Failed audit → [[discard]]: delete the branch dir; main never saw it.
  *
  * Scale note: published snapshots reference data files and manifests under
  * the branch dir (paths are absolute, so reads don't care). `vacuum` only
  * walks the main `data/` root, so those files are never GC'd directly —
  * any later compaction of their buckets rewrites the rows into main's
  * `data/` and the branch dir can then be removed wholesale. While a branch
  * is live, do not `expire` main past the fork version: the branch's chain
  * references main's pre-fork manifests, and expiring them out from under
  * it invalidates the branch (main itself is never at risk). */
object Branch {

  def branchDir(dir: String, name: String): String = {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '-' || c == '_'),
      s"invalid branch name: $name")
    s"$dir/branches/$name"
  }

  /** Fork the current head: the branch starts at main's version with main's
    * exact snapshot (shared data, nothing copied). */
  def fork(dir: String, name: String): String = {
    val bdir = branchDir(dir, name)
    require(!Files.isDirectory(IceLite.metaDir(bdir)), s"branch $name already exists")
    val head = IceLite.load(dir)
    Files.createDirectories(IceLite.metaDir(bdir))
    Files.createDirectories(Paths.get(bdir, "data"))
    Files.createLink(IceLite.snapPath(bdir, head.version), IceLite.snapPath(dir, head.version))
    bdir
  }

  /** The version the branch forked at — its oldest retained snapshot (do
    * not `expire` a branch; audit branches are short-lived by design). */
  def forkVersion(dir: String, name: String): Int =
    IceLite.history(branchDir(dir, name)).head

  /** Versions the branch has committed past the fork point. */
  def aheadBy(dir: String, name: String): Int =
    IceLite.load(branchDir(dir, name)).version - forkVersion(dir, name)

  /** Fast-forward main onto the branch's head. Fails loudly — main
    * untouched — when main has advanced past the fork point (re-fork and
    * replay; rebase across divergent histories is not a thing snapshots can
    * express safely). Idempotent across crashes: already-linked identical
    * versions are skipped, a genuinely contested version aborts. */
  def publish(dir: String, name: String): Int = {
    val bdir = branchDir(dir, name)
    val bHead = IceLite.load(bdir)
    val forkV = forkVersion(dir, name)
    val main = IceLite.load(dir)
    require(main.version >= forkV, s"main at v${main.version} behind fork v$forkV?")
    (forkV + 1 to bHead.version).foreach { v =>
      val target = IceLite.snapPath(dir, v)
      val src = IceLite.snapPath(bdir, v)
      try Files.createLink(target, src)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // ours (crash-resume republish) → skip; someone else's → abort
          val same = java.util.Arrays.equals(
            Files.readAllBytes(target), Files.readAllBytes(src))
          require(same, s"publish conflict: main already has a DIFFERENT v$v " +
            s"(main advanced since fork v$forkV) — re-fork and replay the work")
      }
    }
    bHead.version - forkV
  }

  /** Drop an unpublished (or already-published) branch: its meta and its
    * UNPUBLISHED data. After a publish, main's snapshots reference files
    * under the branch dir, so discard refuses unless the branch head is
    * fully published (or `force` acknowledges the branch was never
    * published and its data is dead). */
  def discard(dir: String, name: String, force: Boolean = false): Unit = {
    val bdir = branchDir(dir, name)
    if (force) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(bdir))
      return
    }
    val bHead = IceLite.load(bdir)
    if (aheadBy(dir, name) == 0) {
      // never committed: nothing in main can reference the branch dir
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(bdir))
      return
    }
    val published = Files.exists(IceLite.snapPath(dir, bHead.version)) &&
      java.util.Arrays.equals(
        Files.readAllBytes(IceLite.snapPath(dir, bHead.version)),
        Files.readAllBytes(IceLite.snapPath(bdir, bHead.version)))
    require(published,
      s"branch $name has unpublished commits — publish or discard(force=true)")
    // published: main's snapshots reference the branch's MANIFESTS (absolute
    // paths into its meta/) and its data files, so only the snapshot chain
    // goes — each v*.json is a hard link whose surviving name is main's
    import scala.jdk.CollectionConverters._
    Files.list(IceLite.metaDir(bdir)).iterator().asScala
      .filter(_.getFileName.toString.matches("v\\d+\\.json"))
      .foreach(Files.delete)
  }
}

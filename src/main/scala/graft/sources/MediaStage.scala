package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Read-through parquet STAGE for the deterministic media fixture
  * corpora (the planted image/audio/video twin tables the m4–m13
  * registry entries run on).
  *
  * Why it exists (round-13 verdict #1): the fixture constructors
  * ([[Multimodal.mediaWithEditedImages]] and friends) synthesize their
  * corpus through REAL codec round trips — encode + decode + re-encode
  * per row. That is fixture scaffolding, not the operator under test,
  * yet every registry query re-paid it at query time (cold JIT
  * included), so the driver's bench gate measured codec fixture
  * synthesis instead of dedup operators (78.2 → 203.2 s when the nine
  * media entries landed). The stream sweeps already learned this
  * lesson — "the corpus is staged to parquet once … which is what a
  * real stream does" — and this applies it to the registry surface:
  * the first query to touch a corpus synthesizes and publishes it
  * ONCE; every later query (and every later bench pass / JVM) reads
  * staged parquet and pays only the decode its operator actually owns.
  * In production terms the staged table IS the media table — payloads
  * come off storage; nobody re-synthesizes their corpus per query.
  *
  * Publish protocol (safe under the concurrent bench pass and across
  * JVMs): build into `<dest>.tmp-<uuid>`, then a same-filesystem
  * ATOMIC rename onto `<dest>`. The loser of a cross-JVM race fails
  * the rename (rename(2) refuses a non-empty dir target), deletes its
  * tmp, and reads the winner's publish. Within one JVM a per-dest
  * monitor keeps concurrent bench threads from double-building. A
  * `_SUCCESS`-less dest (a crashed writer from some older scheme —
  * the tmp+rename path can never leave one) is removed and rebuilt.
  *
  * Staleness: the stage key is (corpus name, fixture TAG, sf dir,
  * SOURCE-DATA fingerprint). The tag is bumped in code whenever a
  * constructor's synthesis logic changes; the fingerprint — a digest
  * over the sf dir's events.parquet file listing (names, sizes,
  * mtimes; every corpus derives from events) — catches the other
  * staleness axis, a testdata dir regenerated IN PLACE under the same
  * path. The stage root defaults under `java.io.tmpdir` and is
  * overridable via the session conf `spark.graft.media.stage.dir`
  * (tests and the bench share the default root — same key, same
  * corpus; a cluster deployment would point it at shared storage,
  * though on a real cluster the media table comes off storage to
  * begin with and this scaffolding has nothing to stage).
  */
object MediaStage {

  val StageDirConf = "spark.graft.media.stage.dir"

  /** Bumped when ANY fixture constructor's synthesis logic changes —
    * part of every stage path, so old publishes go stale by key.
    */
  val FixtureTag = "v2" // v2: planted guaranteed survivors (m6/m9/m12)

  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      // close the walk stream: its directory handles are real fds, and
      // a long-lived bench JVM rebuilding stages would leak them
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(q => Files.deleteIfExists(q))
      finally walk.close()
    }

  private def stageRoot(spark: SparkSession): Path = {
    val root = spark.conf.getOption(StageDirConf)
      .getOrElse(sys.props("java.io.tmpdir") + "/graft_media_stage")
    Paths.get(root)
  }

  /** Fingerprint of the corpus's SOURCE data: every fixture corpus
    * derives from the sf dir's events table, so a digest over its file
    * listing (relative name, size, mtime — sorted) changes whenever
    * the testdata is regenerated in place, and a stale publish under
    * the same path is never read. Listing-only: no data is scanned.
    */
  private def dataFingerprint(sfDir: String): String = {
    val events = Paths.get(sfDir, "events.parquet")
    val listing =
      if (!Files.exists(events)) s"absent:$events"
      else {
        val walk = Files.walk(events)
        try walk.sorted(Comparator.naturalOrder[Path]())
          .map[String](p => s"${events.relativize(p)}:" +
            s"${if (Files.isRegularFile(p)) Files.size(p) else 0}:" +
            s"${Files.getLastModifiedTime(p).toMillis}")
          .reduce("", (a, b) => a + "\n" + b)
        finally walk.close()
      }
    java.security.MessageDigest.getInstance("MD5")
      .digest(listing.getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString
  }

  /** One directory per (sfDir, corpus, tag, data fingerprint) — the sf
    * dir's full path is folded into the key (short sanitized prefix
    * for a human-readable listing + an md5 of the full path so
    * distinct dirs with colliding sanitized names — the ScaleSanity
    * scratch corpora — never share a stage), and the source-data
    * fingerprint guards against in-place regeneration.
    */
  private def destFor(spark: SparkSession, sfDir: String,
                      name: String): Path = {
    val sanitized = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
      .takeRight(40)
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString
    stageRoot(spark).resolve(s"${sanitized}_$digest")
      .resolve(s"${name}_${FixtureTag}_${dataFingerprint(sfDir)}")
  }

  /** Tmp dirs older than this are presumed orphaned by a SIGKILLed
    * writer (the catch-based cleanup only sees exceptions) — a LIVE
    * writer's tmp is minutes old at most (stage builds are
    * seconds-to-minutes), so an hour is conservatively past any
    * in-flight build on this harness.
    */
  private val TmpOrphanAgeMs = 60L * 60 * 1000

  /** Post-publish housekeeping (the unbounded-accumulation fix): a
    * successful publish of `<name>_<tag>_<fp>` (a) prunes SIBLING
    * publishes of the SAME corpus name with a stale tag or data
    * fingerprint — nothing reads them again by construction (the key
    * changed), yet each holds a full payload parquet copy, so repeated
    * testdata regeneration would otherwise accumulate dead corpora
    * forever — and (b) sweeps `.tmp-*` dirs older than
    * [[TmpOrphanAgeMs]] (a writer killed mid-`write.parquet` never
    * reaches its own cleanup). Both are best-effort: GC must never
    * fail the read path, and a concurrent JVM's LIVE publish is never
    * a candidate (its name is the CURRENT key = `keep`, and its tmp is
    * young).
    */
  private def pruneStale(parent: Path, name: String, keep: Path): Unit = {
    val stalePublish =
      java.util.regex.Pattern.compile(
        java.util.regex.Pattern.quote(name) + "_v\\d+_[0-9a-f]{12}")
    val now = System.currentTimeMillis()
    try {
      val ls = Files.list(parent)
      try ls.forEach { p =>
        val fn = p.getFileName.toString
        val staleTmp = fn.contains(".tmp-") &&
          (try Files.getLastModifiedTime(p).toMillis < now - TmpOrphanAgeMs
           catch { case _: Exception => false })
        val stale = p != keep &&
          (staleTmp || stalePublish.matcher(fn).matches())
        if (stale)
          try deleteRecursively(p) catch { case _: Exception => () }
      } finally ls.close()
    } catch { case _: Exception => () }
  }

  /** The staged corpus at `dest`, building and publishing it first if
    * no valid publish exists. `build` runs at most once per key per
    * filesystem lifetime (and at most once per JVM even under the
    * concurrent bench pass). A fresh publish garbage-collects the
    * corpus's STALE siblings (old tag/fingerprint) and any orphaned
    * tmp dirs — see [[pruneStale]].
    */
  def staged(spark: SparkSession, sfDir: String, name: String)
            (build: => DataFrame): DataFrame = {
    val dest = destFor(spark, sfDir, name)
    val lock = locks.computeIfAbsent(dest.toString, _ => new Object)
    lock.synchronized {
      val success = dest.resolve("_SUCCESS")
      if (Files.exists(dest) && !Files.exists(success))
        deleteRecursively(dest) // no writer can be mid-flight: writers
                                // only ever rename complete dirs in
      if (!Files.exists(dest)) {
        Files.createDirectories(dest.getParent)
        val tmp = dest.getParent.resolve(
          s"${dest.getFileName}.tmp-${java.util.UUID.randomUUID()}")
        // a failed build must not orphan its partial tmp dir (each
        // retry gets a fresh uuid — failing runs would accumulate
        // unbounded payload garbage under the shared stage root)
        val t0 = System.nanoTime()
        try build.write.parquet(tmp.toString)
        catch { case e: Throwable => deleteRecursively(tmp); throw e }
        // one receipt line per actual stage build: the cold−warm bench
        // delta decomposes off these instead of being guessed at
        // (round-15 verdict #2 — the FixtureTag bump invalidated every
        // staged corpus and the 140 s cold-wall swing had no in-artifact
        // attribution)
        System.err.println(f"[media-stage] built $name in " +
          f"${(System.nanoTime() - t0) / 1e9}%.1fs -> $dest")
        try Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileAlreadyExistsException |
               _: java.nio.file.FileSystemException =>
            // lost a cross-JVM race — read the winner's publish
            deleteRecursively(tmp)
            require(Files.exists(success),
              s"stage rename onto $dest failed but no valid publish " +
                "exists there")
        }
        pruneStale(dest.getParent, name, dest)
      }
    }
    spark.read.parquet(dest.toString)
  }
}

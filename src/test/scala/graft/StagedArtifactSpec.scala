package graft

import graft.api.StagedArtifact
import org.apache.spark.sql.functions._

/** The staging primitive: content-aware fingerprint (a same-size
  * same-mtime rewrite must invalidate — head OR tail region, r18),
  * build-lease semantics (a contended cold loader waits and reuses
  * instead of paying a duplicate build — thread-level here,
  * PROCESS-level via a real child-JVM fcntl holder), versioned
  * publish with reader grace (r18: a publish never deletes the
  * version a running reader resolved), and the two-phase sibling GC
  * (purge-then-unpoint, each under the owning family's lease). */
class StagedArtifactSpec extends SparkSpec {

  private def tempDir(tag: String): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory(s"staged_spec_$tag").toFile
    d.deleteOnExit(); d
  }

  private def write(f: java.io.File, bytes: Array[Byte]): Unit =
    java.nio.file.Files.write(f.toPath, bytes)

  // ---- fingerprint ------------------------------------------------------

  test("same-size same-mtime content rewrite changes the fingerprint") {
    val src = tempDir("fp")
    val f = new java.io.File(src, "data.bin")
    write(f, Array.fill[Byte](8192)(1))
    val mt = 1700000000000L
    f.setLastModified(mt)
    val fp1 = StagedArtifact.fingerprint(src)
    // rewrite: identical length, identical mtime, different content —
    // the exact blind spot of the r16 (total bytes, max mtime) pair
    write(f, Array.fill[Byte](8192)(2))
    f.setLastModified(mt)
    val fp2 = StagedArtifact.fingerprint(src)
    assert(fp1 !== fp2, "content rewrite validated a stale fingerprint")
    // and it is stable: re-fingerprinting unchanged input is identical
    assert(StagedArtifact.fingerprint(src) === fp2)
  }

  test("a rewrite confined to the HEAD region changes the fingerprint (r18)") {
    // 16 KiB file: head stripe [0,4K) and tail stripe [12K,16K) are
    // disjoint — the r17 tail-only sample was blind to this rewrite
    val src = tempDir("fphead")
    val f = new java.io.File(src, "data.bin")
    val bytes = Array.fill[Byte](16384)(3)
    write(f, bytes)
    val mt = 1700000000000L
    f.setLastModified(mt)
    val fp1 = StagedArtifact.fingerprint(src)
    bytes(100) = 9 // head-region byte; size, mtime, tail unchanged
    write(f, bytes)
    f.setLastModified(mt)
    assert(StagedArtifact.fingerprint(src) !== fp1,
      "head-region rewrite validated a stale fingerprint (ADVICE r17 #2)")
  }

  test("fingerprint distinguishes file renames at equal content") {
    val src = tempDir("fpname")
    write(new java.io.File(src, "a.bin"), Array.fill[Byte](100)(7))
    val fp1 = StagedArtifact.fingerprint(src)
    new java.io.File(src, "a.bin").renameTo(new java.io.File(src, "b.bin"))
    assert(StagedArtifact.fingerprint(src) !== fp1)
  }

  test("empty or missing source trees are errors, not (0,0) identities") {
    val empty = tempDir("fpempty")
    intercept[IllegalArgumentException](StagedArtifact.fingerprint(empty))
    intercept[IllegalArgumentException](
      StagedArtifact.fingerprint(new java.io.File(empty, "nope")))
  }

  // ---- build lease ------------------------------------------------------

  private def oneTable(n: Int) =
    Seq("t" -> spark.range(n).select(col("id")))

  test("thread-level lease: two concurrent cold loads run ONE build") {
    val root = tempDir("lease")
    val idx = new java.io.File(root, "art_lease")
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val threads = (1 to 2).map { _ =>
      new Thread(() =>
        try {
          val t = StagedArtifact.loadOrBuild(spark, idx, "body v1") {
            builds.incrementAndGet()
            Thread.sleep(300) // widen the race window
            oneTable(10)
          }
          rows.add(t("t").count())
        } catch { case t: Throwable => errs.add(t) })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"concurrent load failed: ${errs.peek()}")
    assert(builds.get() === 1,
      "the lease must make the second cold loader wait and reuse, not rebuild")
    assert(rows.size === 2 && rows.stream().distinct().count() === 1)
    // the publish is versioned and pointed (r18 layout)
    assert(StagedArtifact.currentVersionDir(idx).exists(_.isDirectory),
      "publish left no pointed version dir")
  }

  /** Hold an exclusive `FileChannel.lock()` on `lock` from a REAL
    * second process for `secs` seconds, touching `marker` once held.
    * Must be a JVM child: Java file locks are POSIX fcntl locks, which
    * do NOT contend with flock(1)'s BSD flock(2) locks on Linux — a
    * flock-based holder never blocks the library (measured here first:
    * the builder sailed through in 0.35 s). Uses the JDK's single-file
    * source launch, so the child needs no classpath. */
  private def lockHolder(root: java.io.File, lock: java.io.File,
                         marker: java.io.File, secs: Int): Process = {
    val src = new java.io.File(root, "LockHold.java")
    java.nio.file.Files.writeString(src.toPath,
      """import java.nio.channels.FileChannel;
        |import java.nio.file.*;
        |public class LockHold {
        |  public static void main(String[] a) throws Exception {
        |    FileChannel ch = FileChannel.open(Paths.get(a[0]),
        |      StandardOpenOption.CREATE, StandardOpenOption.WRITE);
        |    ch.lock();
        |    Files.createFile(Paths.get(a[1]));
        |    Thread.sleep(Long.parseLong(a[2]) * 1000L);
        |  }
        |}
        |""".stripMargin)
    new ProcessBuilder("java", src.getPath,
      lock.getPath, marker.getPath, secs.toString).inheritIO().start()
  }

  test("process-level lease: a contended builder waits for the OS lock release") {
    val root = tempDir("oslock")
    val idx = new java.io.File(root, "art_oslock")
    val lock = new java.io.File(root, "art_oslock.lock")
    lock.createNewFile()
    val marker = new java.io.File(root, "held")
    val holder = lockHolder(root, lock, marker, 3)
    // wait until the child actually holds the lock
    val t0 = System.nanoTime()
    while (!marker.exists() && (System.nanoTime() - t0) < 60e9) Thread.sleep(20)
    assert(marker.exists(), "lock holder never started")
    val tHeld = System.nanoTime()
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    var buildStart = 0L
    val t = StagedArtifact.loadOrBuild(spark, idx, "body v1") {
      buildStart = System.nanoTime()
      builds.incrementAndGet(); oneTable(5)
    }
    holder.waitFor()
    assert(builds.get() === 1)
    assert(t("t").count() === 5)
    // the build may only START once the holder's 3 s lease expired —
    // measured to build START, so the build+publish wall cannot mask a
    // lock that never blocked
    val waited = (buildStart - tHeld) / 1e9
    assert(waited >= 2.0,
      f"builder did not wait for the contended OS lock (built after $waited%.2f s)")
  }

  test("process-level lease: an artifact published while waiting is reused") {
    val root = tempDir("oslockpub")
    val idx = new java.io.File(root, "art_pub")
    val lock = new java.io.File(root, "art_pub.lock")
    lock.createNewFile()
    val marker = new java.io.File(root, "held")
    val holder = lockHolder(root, lock, marker, 3)
    val t0 = System.nanoTime()
    while (!marker.exists() && (System.nanoTime() - t0) < 60e9) Thread.sleep(20)
    assert(marker.exists(), "lock holder never started")
    // while the lock is held, a "competitor" publishes the complete
    // artifact into the deterministic VERSION dir (test seam: written
    // directly — the waiter cannot see a torn state because the real
    // path publishes by atomic rename)
    val vDir = StagedArtifact.versionDir(idx, "body v1")
    val waiter = new Thread(() =>
      StagedArtifact.loadOrBuild(spark, idx, "body v1") {
        fail("waiter must reuse the artifact published while it waited")
      })
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    waiter.setUncaughtExceptionHandler((_, e) => errs.add(e))
    waiter.start()
    Thread.sleep(500) // let the waiter reach (and block on) the OS lock
    spark.range(7).select(col("id")).write.mode("overwrite")
      .parquet(new java.io.File(vDir, "t").getPath)
    java.nio.file.Files.writeString(
      new java.io.File(vDir, "_STAGED").toPath, "body v1")
    holder.waitFor()
    waiter.join(120000)
    assert(errs.isEmpty, s"waiter failed: ${errs.peek()}")
    assert(spark.read.parquet(new java.io.File(vDir, "t").getPath).count() === 7)
  }

  // ---- versioned publish: reader grace (r18) ----------------------------

  test("reader grace: a lazy frame over version A survives the publish of B") {
    val root = tempDir("grace")
    val src = tempDir("gracesrc")
    val data = new java.io.File(src, "data.bin")
    val idx = new java.io.File(root, "fam_reader")
    def load(rows: Int) = {
      val fp = StagedArtifact.fingerprint(src)
      StagedArtifact.loadOrBuild(spark, idx, s"v=reader fp=$fp",
        gc = Some(("fam_", s"fp=$fp")))(oneTable(rows))
    }
    write(data, Array.fill[Byte](64)(1))
    val vA = StagedArtifact.versionDir(idx,
      s"v=reader fp=${StagedArtifact.fingerprint(src)}")
    val reader = load(11)("t") // lazy frame over version A
    // source regenerated; a new builder publishes version B with GC on
    write(data, Array.fill[Byte](64)(2))
    load(22)
    // version A must be INTACT (grace-protected as `previous`) and the
    // reader's scan must still complete against its original rows
    assert(vA.isDirectory, "publish of B deleted version A under a reader")
    assert(reader.count() === 11,
      "reader's lazy frame no longer scans the version it resolved")
    // the family's NEXT publish collects A (one full cycle of grace)
    write(data, Array.fill[Byte](64)(3))
    load(33)
    assert(!vA.exists, "superseded version survived two publish cycles")
  }

  test("publishDir (the file-artifact seam): build once, reuse forever, immutable path") {
    // the stream replay feed consumes this directly — arbitrary FILES
    // with crafted mtimes, not named parquet tables
    val root = tempDir("pubdir")
    val fam = new java.io.File(root, "feed_x")
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def stage() = StagedArtifact.publishDir(fam, "feed v1") { tmp =>
      builds.incrementAndGet()
      write(new java.io.File(tmp, "batch_000.bin"), Array.fill[Byte](16)(1))
      write(new java.io.File(tmp, "batch_001.bin"), Array.fill[Byte](16)(2))
    }
    val v1 = stage()
    assert(v1 === StagedArtifact.versionDir(fam, "feed v1"),
      "publishDir must return the deterministic version dir")
    assert(new java.io.File(v1, "batch_001.bin").length() === 16)
    assert(new java.io.File(v1, "_STAGED").exists)
    val v1again = stage()
    assert(v1again === v1 && builds.get() === 1,
      "a warm publishDir must reuse the published version, not rebuild")
    // a re-dial publishes a NEW immutable dir; v1 stays grace-intact
    val v2 = StagedArtifact.publishDir(fam, "feed v2") { tmp =>
      write(new java.io.File(tmp, "batch_000.bin"), Array.fill[Byte](8)(3))
    }
    assert(v2 != v1 && v1.isDirectory,
      "a new publish must not disturb the superseded version (reader grace)")
  }

  // ---- sibling-family GC (two-phase, r18) -------------------------------

  /** Run the (a, b) two-variant setup: build both at the current
    * source fingerprint, with cross-family GC enabled. */
  private def twoFamilies(root: java.io.File, src: java.io.File) = {
    def load(variant: String): Unit = {
      val fp = StagedArtifact.fingerprint(src)
      StagedArtifact.loadOrBuild(spark,
        new java.io.File(root, s"fam_$variant"), s"v=$variant fp=$fp",
        gc = Some(("fam_", s"fp=$fp")))(oneTable(3))
    }
    load _
  }

  private def versionDirs(root: java.io.File, fam: String): Seq[String] =
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(fam + "_v"))
      .map(_.getName).sorted.toSeq

  test("sibling GC is two-phase: unpoint first, purge one pass later") {
    val root = tempDir("gc2p")
    val src = tempDir("gc2psrc")
    val data = new java.io.File(src, "data.bin")
    write(data, Array.fill[Byte](64)(1))
    val load = twoFamilies(root, src)
    load("a"); load("b")
    val bPtr = StagedArtifact.pointerFile(new java.io.File(root, "fam_b"))
    assert(bPtr.exists && versionDirs(root, "fam_b").size === 1)
    // regenerate: b's current version goes stale. a's next publish
    // must UNPOINT b (pointer deleted) but leave b's files intact —
    // a reader that resolved them keeps a full cycle of grace
    write(data, Array.fill[Byte](64)(9))
    load("a")
    assert(!bPtr.exists, "stale sibling family was not unpointed")
    assert(versionDirs(root, "fam_b").size === 1,
      "sibling GC purged a just-unpointed version in the same pass")
    // the NEXT publish pass collects the now-unpointed stale version
    write(data, Array.fill[Byte](64)(5))
    load("a")
    assert(versionDirs(root, "fam_b").isEmpty,
      "stale unpointed sibling version survived the next publish pass")
  }

  test("GC skips a sibling whose lease is contended: no unpoint, no blocking") {
    val root = tempDir("gclease")
    val src = tempDir("gcleasesrc")
    val data = new java.io.File(src, "data.bin")
    write(data, Array.fill[Byte](64)(1))
    val load = twoFamilies(root, src)
    load("a"); load("b")
    // regenerate: fam_b's sentinel goes stale
    write(data, Array.fill[Byte](64)(9))
    // a child JVM holds fam_b's lease for 8 s — long enough that a
    // blocking GC would still be waiting when load("a") returns
    val marker = new java.io.File(root, "held")
    val holder = lockHolder(root,
      new java.io.File(root, "fam_b.lock"), marker, 8)
    val t0 = System.nanoTime()
    while (!marker.exists() && (System.nanoTime() - t0) < 60e9) Thread.sleep(20)
    assert(marker.exists(), "lock holder never started")
    load("a") // rebuilds a; GC must TRY b's lease, fail, and skip it
    assert(holder.isAlive,
      "load('a') outlived the 8 s hold — the GC BLOCKED on the contended sibling")
    val bPtr = StagedArtifact.pointerFile(new java.io.File(root, "fam_b"))
    assert(bPtr.exists && versionDirs(root, "fam_b").size === 1,
      "GC touched a sibling whose lease was held")
    holder.waitFor()
    // lease free again: the next two publishes unpoint, then collect
    write(data, Array.fill[Byte](64)(5))
    load("a")
    assert(!bPtr.exists, "stale sibling stayed pointed after its lease freed")
    write(data, Array.fill[Byte](64)(6))
    load("a")
    assert(versionDirs(root, "fam_b").isEmpty,
      "stale sibling version survived GC after its lease was released")
  }

  test("GC keeps live siblings and never touches sentinel-less foreign dirs") {
    val root = tempDir("gc")
    val src = tempDir("gcsrc")
    val data = new java.io.File(src, "data.bin")
    write(data, Array.fill[Byte](64)(1))
    val load = twoFamilies(root, src)
    load("a"); load("b")
    assert(versionDirs(root, "fam_a").size === 1 &&
      versionDirs(root, "fam_b").size === 1,
      "live sibling variants sharing the current fingerprint must survive GC")
    // a sentinel-less foreign dir matching the prefix is never touched
    val foreign = new java.io.File(root, "fam_foreign")
    java.nio.file.Files.createDirectories(foreign.toPath)
    // regenerate twice so both GC phases run against the garden
    write(data, Array.fill[Byte](64)(9)); load("a")
    write(data, Array.fill[Byte](64)(5)); load("a")
    assert(foreign.exists, "GC deleted a dir it does not own (no sentinel)")
    // fam_a itself stays live: exactly current + previous versions
    assert(versionDirs(root, "fam_a").size === 2,
      "same-family GC must keep {current, previous} and nothing else")
  }

  test("pre-r18 flat-layout sibling artifacts are migrated out by GC") {
    val root = tempDir("gclegacy")
    val src = tempDir("gclegacysrc")
    val data = new java.io.File(src, "data.bin")
    write(data, Array.fill[Byte](64)(1))
    // a legacy flat-layout artifact: sentinel directly under fam_old
    val legacy = new java.io.File(root, "fam_old")
    java.nio.file.Files.createDirectories(legacy.toPath)
    java.nio.file.Files.writeString(
      new java.io.File(legacy, "_STAGED").toPath, "v=old fp=stale")
    val load = twoFamilies(root, src)
    load("a")
    assert(!legacy.exists,
      "stale pre-r18 flat-layout sibling survived the GC pass")
  }

  test("publishDir discards a duplicate build when a competitor's publish lands mid-build (r19)") {
    // ADVICE r18 #1: the orphan-lock unlink race (ArtifactLs `clean`
    // swaps the lock-file inode under a holder of the old one) can
    // admit TWO lease holders into the cold path. The interleaving is
    // simulated by having buildInto itself play the faster
    // competitor: it publishes a COMPLETE artifact (payload +
    // matching sentinel) at the version dir while "we" are still
    // building. The re-check immediately before the purge must then
    // keep the competitor's live version — readers may already hold
    // frames over it — and discard our duplicate tmp. (Before the
    // fix, purge(vDir) deleted the competitor's publish here.)
    import java.nio.file.Files
    val root = Files.createTempDirectory("staged_purge_race").toFile
    val fam = new java.io.File(root, "fam")
    val body = "race body v1"
    val vDir = StagedArtifact.versionDir(fam, body)
    val out = StagedArtifact.publishDir(fam, body) { tmp =>
      Files.createDirectories(vDir.toPath)
      Files.writeString(new java.io.File(vDir, "payload").toPath, "COMPETITOR")
      Files.writeString(new java.io.File(vDir, "_STAGED").toPath, body)
      Files.writeString(new java.io.File(tmp, "payload").toPath, "DUPLICATE")
    }
    assert(out === vDir)
    assert(Files.readString(new java.io.File(vDir, "payload").toPath)
      === "COMPETITOR",
      "the slower builder's purge deleted the competitor's live publish")
    assert(!Option(root.listFiles()).getOrElse(Array.empty)
      .exists(_.getName.contains(".tmp_")), "duplicate build tmp not discarded")
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED PQ index (r16) — the codes table, per-subspace
  * codebooks and (for the IVF-PQ variants) coarse gate centroids
  * written ONCE as parquet and READ on every search: the
  * build-once/search-many split a production retrieval deployment
  * actually runs (the Faiss index *file*, re-expressed as tables).
  * Replaces r15's `localCheckpoint(true)` stand-in, which was
  * correct and fast but (a) pinned executor storage memory for the
  * whole session and (b) rebuilt the quantizer in every JVM — the
  * two properties the r15 review called out as the gap between "a
  * measured split" and "a stored artifact".
  *
  * Staging discipline is the one the ordered stream feed proved
  * (StreamOps.qStreamJoinOrdered, hardened over ADVICE r14/r15):
  *  - sentinel `_STAGED` records the canonical fixture path, the PQ
  *    geometry dials, and a recursive (bytes, mtime) fingerprint of
  *    `embeddings.parquet` — a regenerated fixture or a re-dialed
  *    build invalidates the artifact instead of silently serving
  *    stale codes;
  *  - the candidate index is built COMPLETE in a process-unique
  *    sibling, then check-purge-publish runs under an exclusive OS
  *    file lock on a sibling `.lock` (never inside the target, so a
  *    purge cannot delete it) with a re-check under the lock — a
  *    complete index published by a competitor while we built is
  *    reused, never deleted under a third JVM reading from it;
  *  - publish is a single atomic rename: the index is either absent
  *    or complete, no torn state.
  *
  * Layout under `<layoutRoot>/<sfBase>/pq_index_<pathKey>_<variant>`:
  * `codes/` — (neighbor, [cell,] pq0..pq{m−1}), the m-small-ints-per-
  * row compression artifact the ADC scan reads instead of vectors;
  * `books/` — (sub, __cell, __c double[]): sub 0..m−1 = subspace
  * codebooks, sub = −1 = coarse gate centroids. Doubles and ints
  * round-trip parquet exactly, so a search against the stored index
  * is bit-identical to one against a fresh build (PqIndexSpec pins
  * value-for-value equality; the oracle never sees the difference).
  *
  * At 100 TB the codes table is the ~60× compression artifact (m
  * bytes/row vs 256 B of floats) that makes the exhaustive ADC scan
  * feasible; building it once and scanning it per query — rather
  * than re-encoding per session — is the entire point of a stored
  * index. Measured sf10 (SCALE.md §PQ stored index): second-JVM
  * search reads the index cold and skips the build+encode wall.
  */
object PqIndex {

  // staging sibling uniqueness WITHIN a JVM: pid alone is not enough —
  // two session threads cold-loading the same variant would build into
  // (and purge) one shared tmp dir
  private val tmpSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Load the (codes, subspace codebooks, gate centroids) triple from
    * the stored index, building and atomically publishing it first if
    * absent or stale. `build` must return the codes frame WITHOUT the
    * embedding column, the m subspace centroid frames (__cell, __c),
    * and the gate centroid frame when `ivfGate`. `rootOverride` is a
    * test seam (specs stage into a temp root; declared keys use the
    * shared layout root). */
  def loadOrBuild(spark: SparkSession, dir: String,
                  sampledTrain: Boolean, ivfGate: Boolean,
                  rootOverride: Option[String] = None)(
      build: => (DataFrame, Seq[DataFrame], Option[DataFrame]))
      : (DataFrame, IndexedSeq[DataFrame], Option[DataFrame]) = {
    import VectorOps.{PqM, PqSub, PqK, PqIters, PqSamplePct, IvfPqCells}
    val canonical = new java.io.File(dir).getCanonicalPath
    // same key rule as the stream staging: basename for readability,
    // canonical-path hash for uniqueness (two fixtures sharing a NAME
    // must never share an index)
    val pathKey = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8")).take(4)
      .map(b => f"$b%02x").mkString
    val variant = (if (sampledTrain) "s" else "f") + (if (ivfGate) "g" else "n")
    val root = rootOverride.getOrElse(
      s"${Layout.layoutRoot}/${new java.io.File(dir).getName}")
    val idxDir = new java.io.File(s"$root/pq_index_${pathKey}_$variant")

    def fp(f: java.io.File): (Long, Long) =
      Option(f.listFiles()).map(_.toSeq).filter(_.nonEmpty) match {
        case Some(kids) =>
          kids.map(fp).reduce((a, b) => (a._1 + b._1, math.max(a._2, b._2)))
        case None => (f.length(), f.lastModified())
      }
    val embRoot = new java.io.File(dir, "embeddings.parquet")
    require(embRoot.exists,
      s"embeddings.parquet missing under $dir — cannot fingerprint the PQ corpus")
    val (embBytes, embMtime) = fp(embRoot)
    val sentinelBody =
      s"$canonical m=$PqM sub=$PqSub k=$PqK iters=$PqIters" +
        s" samp=${if (sampledTrain) PqSamplePct else 100}" +
        s" cells=${if (ivfGate) IvfPqCells else 0}" +
        s" bytes=$embBytes mtime=$embMtime"
    def stagedOk: Boolean = {
      val s = new java.io.File(idxDir, "_STAGED")
      s.exists && scala.util.Try(java.nio.file.Files.readString(s.toPath))
        .toOption.contains(sentinelBody)
    }
    def purge(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(purge)); f.delete()
    }

    if (!stagedOk) {
      val tmp = new java.io.File(idxDir.getParent,
        s"${idxDir.getName}.tmp_${ProcessHandle.current().pid}_${tmpSeq.incrementAndGet()}")
      purge(tmp)
      java.nio.file.Files.createDirectories(tmp.toPath)
      val (coded, cents, gate) = build
      // one books table: subspace codebooks at sub 0..m−1, the coarse
      // gate (when present) at sub = −1 — a single small parquet a
      // deployment versions alongside the codes
      val books = (cents.zipWithIndex.map { case (c, s) =>
        c.select(lit(s).as("sub"), col("__cell"), col("__c"))
      } ++ gate.map(_.select(lit(-1).as("sub"), col("__cell"), col("__c"))))
        .reduce(_.union(_))
      books.write.mode("overwrite").parquet(new java.io.File(tmp, "books").getPath)
      coded.write.mode("overwrite").parquet(new java.io.File(tmp, "codes").getPath)
      java.nio.file.Files.writeString(
        new java.io.File(tmp, "_STAGED").toPath, sentinelBody)
      val lockFile = new java.io.File(idxDir.getParent, s"${idxDir.getName}.lock")
      val ch = java.nio.channels.FileChannel.open(lockFile.toPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lk = ch.lock()
        try {
          if (stagedOk) purge(tmp) // competitor published while we built
          else {
            purge(idxDir) // sentinel-less or stale-fingerprint garbage
            try java.nio.file.Files.move(tmp.toPath, idxDir.toPath,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            catch { case e: java.nio.file.FileSystemException =>
              purge(tmp)
              if (!stagedOk)
                throw new IllegalStateException(
                  s"PQ index publish failed and no complete index exists at $idxDir", e)
            }
          }
        } finally lk.release()
      } finally ch.close()
    }
    // read the PUBLISHED artifact on both paths — the building JVM and
    // a later one execute the identical scan, so the measured search
    // wall is the stored-index wall everywhere
    val codes = spark.read.parquet(new java.io.File(idxDir, "codes").getPath)
    val books = spark.read.parquet(new java.io.File(idxDir, "books").getPath)
    val cents = (0 until PqM).map(s =>
      books.filter(col("sub") === s).select(col("__cell"), col("__c")))
    val gateCent =
      if (ivfGate) Some(books.filter(col("sub") === -1).select(col("__cell"), col("__c")))
      else None
    (codes, cents, gateCent)
  }
}

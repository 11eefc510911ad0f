package graft

import graft.queries.{PqIndex, VectorOps}
import org.apache.spark.sql.functions._

/** The persisted PQ index (r16): stored-vs-fresh equality, reuse
  * without rebuild, fingerprint invalidation, and concurrent
  * build/publish under the staging lock — the same race family
  * StreamingSpec pins for the ordered-feed staging. */
class PqIndexSpec extends SparkSpec {

  private def tempRoot(tag: String): java.io.File = {
    val d = java.nio.file.Files
      .createTempDirectory(s"pq_idx_spec_$tag").toFile
    d.deleteOnExit(); d
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("stored index equals a fresh in-session build, value for value") {
    val (codes, cents, gate) =
      PqIndex.loadOrBuild(spark, sf, sampledTrain = true, ivfGate = true)(
        VectorOps.pqBuild(spark, sf, sampledTrain = true, ivfGate = true))
    val (fCodes, fCents, fGate) =
      VectorOps.pqBuild(spark, sf, sampledTrain = true, ivfGate = true)
    assert(sortedRows(codes) === sortedRows(fCodes),
      "stored codes table diverged from a fresh encode")
    cents.zip(fCents).zipWithIndex.foreach { case ((s, f), i) =>
      assert(sortedRows(s) === sortedRows(f), s"codebook $i diverged")
    }
    assert(sortedRows(gate.get) === sortedRows(fGate.get), "gate centroids diverged")
  }

  test("second load reuses the artifact: sentinel and part files untouched") {
    // first call (possibly already published by the prior test — fine)
    PqIndex.loadOrBuild(spark, sf, sampledTrain = true, ivfGate = false)(
      VectorOps.pqBuild(spark, sf, sampledTrain = true, ivfGate = false))
    val pathKey = java.security.MessageDigest.getInstance("MD5")
      .digest(new java.io.File(sf).getCanonicalPath.getBytes("UTF-8")).take(4)
      .map(b => f"$b%02x").mkString
    val fam = new java.io.File(
      s"${graft.queries.Layout.layoutRoot}/${new java.io.File(sf).getName}" +
        s"/pq_index_${pathKey}_sn")
    // r18: the publish is versioned; resolve the pointed version dir
    val idx = graft.api.StagedArtifact.currentVersionDir(fam)
      .getOrElse(fail("publish left no pointed version dir"))
    val sentinel = new java.io.File(idx, "_STAGED")
    assert(sentinel.exists, "publish left no sentinel")
    val mt0 = sentinel.lastModified()
    val parts0 = new java.io.File(idx, "codes").list().sorted.toSeq
    val (codes2, _, _) =
      PqIndex.loadOrBuild(spark, sf, sampledTrain = true, ivfGate = false)(
        fail("second load must not rebuild"))
    assert(codes2.count() > 0)
    assert(sentinel.lastModified() === mt0, "sentinel rewritten on a warm load")
    assert(new java.io.File(idx, "codes").list().sorted.toSeq === parts0,
      "codes part files changed on a warm load")
  }

  test("regenerated fixture invalidates the index (fingerprint sentinel)") {
    // private fixture copy so the mtime bump can't perturb shared state
    val fix = tempRoot("fixture")
    val src = new java.io.File(sf, "embeddings.parquet")
    def copyInto(s: java.io.File, d: java.io.File): Unit =
      if (s.isDirectory) {
        java.nio.file.Files.createDirectories(d.toPath)
        s.listFiles().foreach(k => copyInto(k, new java.io.File(d, k.getName)))
      } else
        java.nio.file.Files.copy(s.toPath, d.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    copyInto(src, new java.io.File(fix, "embeddings.parquet"))
    val root = tempRoot("layout").getPath
    var builds = 0
    def load() = PqIndex.loadOrBuild(spark, fix.getPath,
      sampledTrain = false, ivfGate = false, rootOverride = Some(root)) {
      builds += 1
      VectorOps.pqBuild(spark, fix.getPath, sampledTrain = false, ivfGate = false)
    }
    load(); load()
    assert(builds === 1, "warm load rebuilt despite a valid sentinel")
    // regenerate-in-place: newest mtime moves, bytes stay — must rebuild
    def bump(f: java.io.File): Unit =
      if (f.isDirectory) f.listFiles().foreach(bump)
      else f.setLastModified(f.lastModified() + 5000)
    bump(new java.io.File(fix, "embeddings.parquet"))
    load()
    assert(builds === 2, "stale fingerprint served a stale index")
  }

  test("concurrent cold loads race safely under the staging lock") {
    val root = tempRoot("race").getPath
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { _ =>
      new Thread(() =>
        try {
          val (codes, _, _) = PqIndex.loadOrBuild(spark, sf,
            sampledTrain = true, ivfGate = true, rootOverride = Some(root))(
            VectorOps.pqBuild(spark, sf, sampledTrain = true, ivfGate = true))
          results.add(codes.count())
        } catch { case t: Throwable => errs.add(t) })
    }
    threads.foreach(_.start()); threads.foreach(_.join(300000))
    assert(errs.isEmpty, s"concurrent load failed: ${errs.peek()}")
    assert(results.size === 2 && results.stream().distinct().count() === 1,
      "racing loads disagree on the published codes table")
    // exactly one complete version dir remains (plus the family's
    // lock and _CURRENT pointer), no torn tmp dirs
    val left = new java.io.File(root).list().filter(_.startsWith("pq_index"))
    assert(left.count(n =>
      !n.endsWith(".lock") && !n.endsWith("._CURRENT")) === 1,
      s"staging debris after the race: ${left.mkString(",")}")
  }
}

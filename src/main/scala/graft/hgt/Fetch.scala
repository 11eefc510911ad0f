package graft.hgt

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Dataset download stage of the `hgtget` command (SURVEY.md §2.1 R3):
  * manifest → fetch plan → worker-pool execution, with the network
  * itself behind a [[Fetch.Fetcher]] interface — exactly the
  * [[Sinks.SqlExecutor]] pattern, so the bookkeeping (what gets
  * fetched, what gets skipped, what failed) is golden-testable in this
  * zero-egress container while a real HTTP fetcher slots in unchanged.
  *
  * The plan/execute split mirrors how a production downloader behaves
  * at dataset scale: planning is pure (idempotent re-runs re-derive
  * skip state from the filesystem — the R8 existence logic), execution
  * is a bounded worker pool where one failed URL records an outcome
  * and never kills the batch.
  */
object Fetch {

  /** One unit of download work. `skip` is decided at PLAN time from
    * target existence (R8: already-downloaded files are never
    * re-fetched). */
  case class FetchTask(url: String, target: String, skip: Boolean)

  /** The network boundary. Implementations must write the full remote
    * object to `target` or throw (partial files are the caller's
    * temp-file concern — see [[urlFetcher]]). */
  trait Fetcher { def fetch(url: String, target: Path): Unit }

  /** Parse manifest lines (one URL per line; blank lines and `#`
    * comments ignored) into the fetch plan against `workDir`: target =
    * workDir/basename(url), skip = target already exists. Pure given
    * the filesystem snapshot — re-planning after a partial run yields
    * exactly the remaining work. */
  def plan(manifestLines: Seq[String], workDir: String): Seq[FetchTask] = {
    val urls = manifestLines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
    urls.map { url =>
      val name = Paths.get(new java.net.URI(url).getPath match {
        case p if p != null && p.nonEmpty => p
        case _ => url
      }).getFileName.toString
      val target = Paths.get(workDir, name)
      FetchTask(url, target.toString, Files.exists(target))
    }
  }

  /** Execute a plan on a `parallelism`-wide worker pool. Returns one
    * bookkeeping line per task, IN PLAN ORDER regardless of completion
    * order (deterministic → golden-testable):
    * `SKIP target` | `OK url -> target` | `FAIL url: message`.
    * Skipped tasks never reach the fetcher; a throwing fetch records
    * FAIL and the pool carries on. */
  def run(tasks: Seq[FetchTask], fetcher: Fetcher, parallelism: Int = 4): Seq[String] = {
    val pool = Executors.newFixedThreadPool(math.max(1, parallelism))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val outcomes = tasks.map { t =>
        if (t.skip) Future.successful(s"SKIP ${t.target}")
        else Future {
          fetcher.fetch(t.url, Paths.get(t.target))
          s"OK ${t.url} -> ${t.target}"
        }.recover { case e: Throwable =>
          s"FAIL ${t.url}: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}"
        }
      }
      Await.result(Future.sequence(outcomes), Duration.Inf)
    } finally pool.shutdown()
  }

  /** Real HTTP(S) fetcher — env-gated like the JDBC side of
    * [[Sinks.SqlExecutor]]: this container has zero egress, so
    * construction requires SPARK_GRAFT_ALLOW_NETWORK=1. Downloads to a
    * `.part` temp file and renames atomically, so a killed worker
    * never leaves a half-written target that a re-plan would SKIP. */
  def urlFetcher(): Fetcher = {
    require(sys.env.get("SPARK_GRAFT_ALLOW_NETWORK").contains("1"),
      "network fetch is env-gated: set SPARK_GRAFT_ALLOW_NETWORK=1")
    (url: String, target: Path) => {
      val tmp = target.resolveSibling(target.getFileName.toString + ".part")
      val in = new java.net.URI(url).toURL.openStream()
      try Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }
}

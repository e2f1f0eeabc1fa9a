package graft

/** Scratch directories for queries that materialize artifacts
  * (persisted indexes, streaming sources/checkpoints, register
  * artifacts): everything is created under ONE per-JVM root that a
  * shutdown hook deletes recursively, so repeated bench captures,
  * suite runs and Verify passes stop accumulating dead copies of the
  * corpus in the system temp dir. Deletion is best-effort — a failure
  * at exit must never mask the run's real outcome. */
object Scratch {

  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(r)))
    r
  }

  /** A fresh directory under the self-cleaning root. */
  def dir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(root, prefix).toString

  /** Release one scratch directory NOW (probes that loop over
    * per-stage scratch artifacts — e.g. the drift probe's per-batch
    * rebuild indexes — release each as soon as it is read, instead
    * of accumulating until the exit sweep). Best-effort, and only
    * paths under the self-cleaning root are touched. */
  def drop(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.normalize.startsWith(root.normalize)) delete(p)
  }

  private def delete(p: java.nio.file.Path): Unit =
    try {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => try Files.deleteIfExists(f) catch {
          case _: java.io.IOException => ()
        })
    } catch { case scala.util.control.NonFatal(_) => () }
}

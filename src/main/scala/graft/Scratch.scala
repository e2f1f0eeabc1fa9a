package graft

/** Scratch directories for queries that materialize artifacts
  * (persisted indexes, streaming sources/checkpoints, register
  * artifacts): everything is created under ONE per-JVM root that a
  * shutdown hook deletes recursively, so repeated bench captures,
  * suite runs and Verify passes stop accumulating dead copies of the
  * corpus in the system temp dir. Deletion is best-effort — a failure
  * at exit must never mask the run's real outcome.
  *
  * PLACEMENT (r16 optimization round, guide §1 measure-first + §6):
  * the all-thread stack sampler read the heavy iterative queries
  * spending whole seconds in `FileOutputStream.open0` /
  * `IndexShuffleBlockResolver.writeMetadataFileAndCommit` — shuffle
  * and artifact FILE CREATION, not compute. This host's system temp
  * dir is ext4 (measured 0.28 ms/create vs 0.009 ms on the RAM-backed
  * `/dev/shm` tmpfs, 31×, worse under 32 concurrent creators). Scratch
  * therefore roots itself on the fastest writable scratch tier:
  * `$SPARK_GRAFT_SCRATCH_DIR` when set (`off` forces the system temp
  * dir), else `/dev/shm` when writable, else the system temp dir —
  * the same decision a production deployment makes when it points
  * `spark.local.dir` at its NVMe array instead of the OS disk. The
  * shutdown-hook cleanup bounds tmpfs growth (and [[sparkLocalDir]]
  * lives under the same self-cleaning root, so block-manager dirs
  * from a killed run can't leak RAM across runs). Placement changes
  * WHERE bytes land, never what any query computes. */
object Scratch {

  private lazy val root: java.nio.file.Path = {
    import java.nio.file.{Files, Paths}
    val base = sys.env.get("SPARK_GRAFT_SCRATCH_DIR") match {
      case Some("off") => None
      case Some(dir) => Some(Paths.get(dir))
      case None =>
        Some(Paths.get("/dev/shm")).filter(p =>
          Files.isDirectory(p) && Files.isWritable(p))
    }
    val r = base match {
      case Some(b) => Files.createTempDirectory(b, "graft_scratch_")
      case None => Files.createTempDirectory("graft_scratch_")
    }
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(r)))
    r
  }

  /** Per-JVM `spark.local.dir` under the self-cleaning root — session
    * builders pass this so shuffle/spill scratch rides the same fast
    * tier (see the placement note above). Resolved lazily at first
    * session build; stable for the JVM's lifetime. */
  lazy val sparkLocalDir: String = dir("spark_local_")

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

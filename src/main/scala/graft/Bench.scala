package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line per run, consumed by the driver as
  * BENCH_r{N}.json.
  *
  * Each query runs `SPARK_GRAFT_BENCH_REPEATS` (default 3) times
  * back-to-back and reports the MEDIAN seconds: a single cold run
  * cannot distinguish a real regression from scheduler noise (round-3
  * review burned time adjudicating 4× "regressions" on queries with no
  * code change). Per-query min + all samples go to `bench_detail.json`.
  *
  * Capture hygiene (round-5, after the r4 capture disagreed with
  * recorded medians by ~1.6× on untouched queries):
  *  - queries run in NUMERIC registry order (q01..q120), not
  *    lexicographic — lexicographic sorting slotted the 20 heavy
  *    q100-q120 queries between q10 and q12, dragging their GC/shuffle
  *    state into the q12-q26 cluster that inflated 3-15× in the r4
  *    capture; numeric order also keeps new queries appended at the
  *    END, so earlier queries' positions stay comparable across rounds
  *  - between queries: unpersist any leaked cached RDDs/DataFrames,
  *    clear the catalog cache, and System.gc() — each query starts from
  *    the same JVM state regardless of what ran before it
  *  - machine load (1-min load average) and free heap are sampled at
  *    start and end and recorded in the emitted line, so a contended
  *    capture window is visible in the artifact instead of being
  *    adjudicated from memory a round later
  *
  * Steal-robust repeats (VERDICT r14 #2 — round 14 burned FOUR
  * same-code captures spread 256–367 s across a steal-contended
  * afternoon, and the driver's shipped number still landed 1.19× on
  * contention the telemetry could SEE): the per-repeat host telemetry
  * is now used AT CAPTURE TIME, not just recorded. A repeat ≥ 1.0 s
  * whose host-steal share crosses `SPARK_GRAFT_BENCH_MAX_STEAL`
  * (default 5%) or whose OTHER-PROCESS cpu share crosses
  * `SPARK_GRAFT_BENCH_MAX_OTHER` (default 20% — steal is hypervisor
  * contention, other-process share is co-tenant contention; both
  * inflate wall time without touching JVM metrics) is DISCARDED and
  * re-run, up to `SPARK_GRAFT_BENCH_RETRY` (default 2) extra repeats
  * per query and 40 per capture. Discarded samples stay in
  * bench_detail.json (`rdropSec`/`rdropSteal`/`rdropOther`, per
  * query) — nothing is silently thrown away — and when the budget
  * exhausts with a flagged sample still in the kept set, the query
  * carries `"contended":1` in the detail and the capture envelope
  *  carries `"contended":N` (query count): the artifact names itself
  * unreliable instead of shipping a quiet-looking inflated median.
  * Sub-1.0 s repeats never retry: contention noise at tail scale
  * carries no regression signal, and the budget is better spent on
  * the heavy rows the r14 window actually moved (the first r15
  * capture spent its only `contended` flag on a 0.9 s row).
  * `SPARK_GRAFT_BENCH_MAX_STEAL=off` disables retries (the A/B
  * control). bench_detail.json is additionally written to a
  * cid-suffixed copy (`bench_detail.<cid>.json`) so a late round
  * stamp can never lose a shipped capture again (VERDICT r14 #5).
  */
object Bench {

  /** Per-query JVM/stage telemetry (round-12, VERDICT r11 #1): two
    * rounds of driver captures read q166 at 2.5-3× its local median
    * and the commit-vs-commit A/Bs could only clear the CODE — the
    * capture context (GC pressure? cache eviction? a join flip?) was
    * unnamed because nothing recorded it. This listener sums task
    * metrics so every repeat of every query carries its own GC ms,
    * shuffle read/write bytes, spill bytes, and peak execution
    * memory in bench_detail.json — the next anomalous driver row
    * adjudicates itself from the artifact.
    *
    * The listener bus is asynchronous, so a snapshot taken right at
    * query end could miss in-flight task-end events; [[settleRead]]
    * polls until two consecutive reads agree (all jobs are already
    * complete when it is called — only bus drain is being waited
    * out), which bounds the wait without touching Spark's
    * private[spark] waitUntilEmpty. */
  private final class Telemetry extends org.apache.spark.scheduler.SparkListener {
    import java.util.concurrent.atomic.AtomicLong
    val gcMs, shufRead, shufWrite, spill = new AtomicLong
    val peakMem = new AtomicLong // max over tasks since last reset
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        gcMs.addAndGet(m.jvmGCTime)
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        peakMem.getAndAccumulate(m.peakExecutionMemory, math.max)
      }
    }
    private def read: (Long, Long, Long, Long, Long) =
      (gcMs.get, shufRead.get, shufWrite.get, spill.get, peakMem.get)
    /** Wait for the async bus to drain (stable read), then return the
      * counters since the last reset and zero them. The Boolean is
      * the settled flag (ADVICE r12): `false` means the 1 s cap fired
      * before two consecutive reads agreed, so the returned counters
      * may be partially drained and the NEXT repeat inherits the
      * remainder — the artifact marks it instead of silently bleeding
      * attribution across repeats. */
    def settleRead(): ((Long, Long, Long, Long, Long), Boolean) = {
      var prev = read
      var stable = false
      var waited = 0
      while (!stable && waited < 1000) {
        Thread.sleep(10); waited += 10
        val cur = read
        stable = cur == prev
        prev = cur
      }
      gcMs.set(0); shufRead.set(0); shufWrite.set(0); spill.set(0)
      peakMem.set(0)
      (prev, stable)
    }
  }

  /** (total cpu ticks, steal ticks, busy ticks) from /proc/stat —
    * host-level CPU steal is invisible to load average and JVM
    * metrics, but it inflates every query uniformly (the broad-window
    * capture class); sampling it per repeat makes that cause readable
    * from the artifact. Busy = total − idle − iowait − steal:
    * subtracting this JVM's own cpu time from it yields the
    * OTHER-PROCESS share, the co-tenant-contention signal the retry
    * gate uses next to steal. Steal is excluded from busy so the two
    * signals stay DISJOINT — a pure-steal window must not read as
    * co-tenant load too (they are the classes the per-repeat columns
    * exist to distinguish). (0,0,0) off Linux. */
  private def cpuTicks(): (Long, Long, Long) =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+")
          .drop(1).map(_.toLong)
        val steal = if (f.length > 7) f(7) else 0L
        val idleIo =
          (if (f.length > 3) f(3) else 0L) +
            (if (f.length > 4) f(4) else 0L)
        (f.sum, steal, f.sum - idleIo - steal)
      } finally src.close()
    } catch { case _: Exception => (0L, 0L, 0L) }

  /** This JVM's cumulative cpu time in ns (−1 when the platform bean
    * doesn't expose it). /proc/stat ticks are USER_HZ = 100/s on
    * every Linux this runs on; the caller converts. */
  private def procCpuNs(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean =>
        b.getProcessCpuTime
      case _ => -1L
    }

  /** One timed repeat with its host/JVM context (capture order). */
  private final case class Sample(sec: Double, load: Double,
      freeMb: Long, tele: (Long, Long, Long, Long, Long),
      steal: Double, other: Double, settled: Boolean)

  /** One query's capture: kept samples (exactly `repeats`), any
    * retry-discarded samples, and whether a flagged sample survived
    * the retry budget. */
  private final case class QRes(name: String, median: Double,
      min: Double, samples: Seq[Sample], dropped: Seq[Sample],
      contended: Boolean)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val repeats = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3").toInt)
    // numeric registry order (see scaladoc): "q116_quality_gate" -> 116
    val all = SparkEntry.queries.toSeq.sortBy { case (n, _) =>
      (n.drop(1).takeWhile(_.isDigit) match {
        case "" => Int.MaxValue
        case ds => ds.toInt
      }, n)
    }
    // Dev-only subset filter for regression adjudication (comma-
    // separated name prefixes, e.g. "q46,q93"). The driver never sets
    // it — full-registry runs are unaffected.
    val queries = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(spec) =>
        val pres = spec.split(",").map(_.trim).filter(_.nonEmpty)
        all.filter { case (n, _) => pres.exists(n.startsWith) }
      case None => all
    }
    // Keys are shortened to the bare query NUMBER ("q01_pricing" → "1")
    // to fit the capture window — the q prefix and leading zero spent
    // ~2 chars × 172 queries of the ~2000-char budget (r8 overflowed at
    // 2062). A collision would emit duplicate JSON keys and shadow one
    // timing — fail fast BEFORE spending minutes running queries.
    val prefixes = queries.map { case (n, _) =>
      val digits = n.drop(1).takeWhile(_.isDigit)
      if (n.startsWith("q") && digits.nonEmpty) digits.toInt.toString
      else n.takeWhile(_ != '_')
    }
    require(prefixes.distinct.size == queries.size,
      s"duplicate bench key prefixes: ${prefixes.diff(prefixes.distinct).distinct.mkString(",")}")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // shuffle/spill scratch on the fastest writable tier (see the
      // Scratch placement scaladoc — measured 31× file-create gap on
      // this host; parameterised via SPARK_GRAFT_SCRATCH_DIR)
      .config("spark.local.dir", Scratch.sparkLocalDir)
      // serialized sort writer for every exchange (the 100 TB writer;
      // see SparkTuning — bypass's per-reduce file concat mmap-thrashed
      // 32-core runs)
      .config("spark.shuffle.sort.bypassMergeThreshold",
        SparkTuning.bypassMergeThreshold)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def load1: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    def freeHeapMb: Long = {
      val rt = Runtime.getRuntime
      (rt.maxMemory - rt.totalMemory + rt.freeMemory) / (1024 * 1024)
    }
    // reset the JVM to a common baseline before the next query: drop any
    // cached/persisted data a query leaked, then collect garbage so the
    // following query isn't charged for its predecessor's heap
    def settle(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
    }
    val telemetry = new Telemetry
    spark.sparkContext.addSparkListener(telemetry)
    // warm-up: JIT + codegen + parquet footer caches
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).count()
    // pre-settle the per-JVM NN-descent serving artifacts (VERDICT
    // r13 #2): a pure function of the data, like the cache settle —
    // the q232 repeats must measure SERVING, not the artifact build's
    // first-materialization GC (measured 23.3/26.1/3.1 s across
    // repeats with the build inside the timed window). q240 (ingest)
    // and q243 (serve top-k) read the same artifacts, so a subset
    // run including either without q232 must pre-settle too
    // (ADVICE r14, extended to q243 in r15, q244 in r16 — q244 also
    // pre-settles the broadcast RAM replica its hot engine serves
    // from, so its repeats time the ONE-job walk, not the replica
    // collect).
    if (queries.exists(q => q._1.startsWith("q232") ||
        q._1.startsWith("q240") || q._1.startsWith("q243") ||
        q._1.startsWith("q244")))
      AnnIndexes.nnDescentServing(spark, sfDir)
    if (queries.exists(_._1.startsWith("q244")))
      AnnIndexes.hotReplica(spark, sfDir)
    settle()
    telemetry.settleRead() // discard warm-up counters
    val loadStart = load1
    // retry-gate knobs (see the steal-robust scaladoc above)
    val maxStealSpec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_STEAL", "5.0")
    val retryEnabled = maxStealSpec.toLowerCase != "off"
    val maxSteal =
      if (retryEnabled) maxStealSpec.toDouble else Double.MaxValue
    val maxOther =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_OTHER", "20.0").toDouble
    val retryPerQuery = math.max(0,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRY", "2").toInt)
    val retryPerCapture = 40
    var retriesSpent = 0
    // Per-repeat samples stay in CAPTURE ORDER everywhere they are
    // emitted (verbose + detail): round 7's q120 adjudication stalled on
    // exactly this — the sorted list showed a 17 s outlier but not WHICH
    // repeat it was, and "last repeat slow" vs "first repeat cold" are
    // different root causes. Load average + free heap are sampled after
    // each repeat so a contended or heap-starved repeat is visible in
    // the artifact.
    val results = queries.map { case (name, fn) =>
      def runOnce(): Sample = {
        val ticks0 = cpuTicks()
        val proc0 = procCpuNs()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val ticks1 = cpuTicks()
        val proc1 = procCpuNs()
        val dTot = ticks1._1 - ticks0._1
        val steal =
          if (dTot <= 0) 0.0
          else 100.0 * (ticks1._2 - ticks0._2) / dTot
        // other-process cpu share: host busy ticks minus this JVM's
        // own (USER_HZ = 100 ticks/s), floored at 0 (clock skew)
        val other =
          if (dTot <= 0 || proc0 < 0 || proc1 < 0) 0.0
          else {
            val procTicks = (proc1 - proc0) * 100.0 / 1e9
            100.0 * math.max(0.0,
              (ticks1._3 - ticks0._3) - procTicks) / dTot
          }
        val (tele, settled) = telemetry.settleRead()
        Sample(sec, load1, freeHeapMb, tele, steal, other, settled)
      }
      // the 1.0 s floor keeps tail rows out of the retry budget: the
      // first r15 full capture (cid 1786898073) spent flags on a
      // 0.9 s row whose inflation was ≤ 0.4 s — sub-second noise
      // carries no regression signal (the tail-fold rationale), and
      // a capture-level `contended` flag earned by a 0.9 s row
      // misreads as a broken window
      def flagged(s: Sample): Boolean =
        s.sec >= 1.0 && (s.steal >= maxSteal || s.other >= maxOther)
      val dropped = scala.collection.mutable.Buffer.empty[Sample]
      var qRetries = 0
      val samples = (1 to repeats).map { _ =>
        var s = runOnce()
        while (retryEnabled && flagged(s) &&
            qRetries < retryPerQuery && retriesSpent < retryPerCapture) {
          dropped += s
          qRetries += 1
          retriesSpent += 1
          s = runOnce()
        }
        s
      }
      settle()
      val times = samples.map(_.sec)
      val sorted = times.sorted
      val median = sorted(sorted.size / 2)
      QRes(name, median, sorted.head, samples, dropped.toSeq,
        contended = retryEnabled && samples.exists(flagged))
    }
    val loadEnd = load1
    val contendedN = results.count(_.contended)
    if (contendedN > 0)
      System.err.println(s"[bench] CONTENDED capture: $contendedN " +
        "queries kept a steal/other-flagged sample after the retry " +
        "budget — treat medians as upper bounds (see bench_detail)")
    if (sys.env.contains("SPARK_GRAFT_BENCH_VERBOSE")) {
      results.foreach { r =>
        System.err.println(f"[bench] ${r.name}%-28s med=${r.median}%.3f min=${r.min}%.3f all=${r.samples.map(s => f"${s.sec}%.3f").mkString(",")} load=${r.samples.map(s => f"${s.load}%.1f").mkString(",")} freeMb=${r.samples.map(_.freeMb).mkString(",")}" +
          (if (r.dropped.nonEmpty) s" dropped=${r.dropped.map(s => f"${s.sec}%.3f").mkString(",")}" else ""))
      }
    }
    // Scalar median per query (the driver contract's {"q1":sec} shape).
    // r4 briefly shipped [median,min] pairs, which left <4 queries of
    // headroom in the driver's ~2000-char capture window at 102 queries;
    // the min lives on in bench_detail.json for adjudication.
    //
    // r10 trim: sub-threshold queries leave the per-query map and fold
    // into ONE top-level "tail" summary (count, summed seconds, max) —
    // the per-query series for EVERY query, tail included, stays in
    // bench_detail.json (the series of record); a tail query that
    // regresses past the threshold simply reappears in the map. The
    // summary is a top-level envelope key, NOT a fake entry inside
    // "queries", so the driver's per-query ingestion never sees a
    // non-query key or a non-scalar value.
    //
    // r11: threshold raised 0.15 → 0.2 s after the 222-query line hit
    // 1956 chars and degraded the stdout copy to total-only. Entries
    // in [0.15, 0.2) carry no regression signal either (the trip-bar
    // is >0.2 s); folding the ~29 of them buys ~260 chars.
    // r12: 0.2 → 0.25 — the 227-query line read 1916 chars (3 queries
    // of headroom).
    // r13 (VERDICT r12 #6): per-query values are INTEGER DECISECONDS
    // ("231":51 = 5.1 s), flagged by "qunit":"ds" in the envelope —
    // threshold bumps were degrading the driver series one band at a
    // time, and the decimal point + fraction digit were the cost.
    // Measured at the 229-query r13 capture: 1495 chars at the 0.25
    // threshold (was 1916 at 227 in the old encoding) — ~50 queries
    // of headroom at ~9 chars/entry before the 1950 window. A
    // [0.2, 0.25) row stays out of the stdout line (no trip-bar
    // signal, the r12 rationale); bench_detail.json remains the
    // full-precision series of record for every query.
    val tailThreshold = 0.25
    val (big, tail) = prefixes.zip(results)
      .partition { case (_, r) => r.median >= tailThreshold }
    val qs = big
      .map { case (k, r) =>
        "\"" + k + "\":" + math.round(r.median * 10) }
      .mkString("{", ",", "}")
    val tailSum = tail.map(_._2.median).sum
    val tailMax = if (tail.isEmpty) 0.0 else tail.map(_._2.median).max
    val tailJson = f""""tail":{"lt":$tailThreshold%.2f,"n":${tail.size},"sec":$tailSum%.2f,"max":$tailMax%.2f}"""
    // Self-adjudication evidence on stderr (NOT the stdout capture — the
    // driver's ~2000-char window is reserved for the metric line): the
    // top movers' per-repeat samples in capture order, with per-repeat
    // load + free heap. A capture like r7's q120 (median 66 s that did
    // not reproduce isolated) is then diagnosable from the round's log
    // alone — which repeats were slow, and whether load or heap moved.
    def mb(b: Long): String = f"${b / 1048576.0}%.1f"
    // SLOWEST LAST (r13): the driver keeps the TAIL of stderr, and the
    // r12 q187 adjudication failed because the slowest query's line —
    // printed first — was the one the window truncated. Ascending
    // order guarantees the anomalous row is the closest to the cut.
    results.sortBy(_.median).takeRight(10).foreach { r =>
      val all = r.samples
      System.err.println(f"[bench-top] ${r.name} med=${r.median}%.3f " +
        f"all=${all.map(s => f"${s.sec}%.3f").mkString(",")} " +
        f"load=${all.map(s => f"${s.load}%.1f").mkString(",")} " +
        f"freeMb=${all.map(_.freeMb).mkString(",")} " +
        f"gcMs=${all.map(_.tele._1).mkString(",")} " +
        f"shufMb=${all.map(s => mb(s.tele._2 + s.tele._3)).mkString(",")} " +
        f"steal%%=${all.map(s => f"${s.steal}%.1f").mkString(",")}" +
        (if (r.dropped.nonEmpty)
          s" dropped=${r.dropped.map(s => f"${s.sec}%.3f").mkString(",")}"
        else ""))
    }
    val total = results.map(_.median).sum // sum of per-query medians
    // basename only: the full path spends ~15 chars of the driver's
    // ~2000-char capture window on redundant prefix
    val sfName = new java.io.File(sfDir).getName
    // capture-context telemetry: 1-min load average at start/end of the
    // run (plus free heap) — a contended window (concurrent sbt, driver
    // side-work) shows up here, making a 117s-vs-70s capture dispute
    // adjudicable from the artifact itself. The capture id (epoch
    // seconds + start load) is shared verbatim between the metric line
    // and bench_detail.json's __env, so a detail file can never
    // silently describe a DIFFERENT run than the metric line it sits
    // next to (the r10 __env mismatch).
    val captureId =
      s"${System.currentTimeMillis / 1000}-" + f"$loadStart%.1f"
    val env = f""""load":[$loadStart%.1f,$loadEnd%.1f],""" +
      f""""freeMb":$freeHeapMb,"cid":"$captureId","qunit":"ds"""" +
      (if (contendedN > 0) s""","contended":$contendedN""" else "")
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","runs":$repeats,$env,$tailJson,"queries":$qs,"sf":"$sfName"}"""
    // Full per-repeat telemetry for every query whose median crossed
    // 5 s, embedded in the bench_result.json line (which the driver
    // captures whole) — the r12 q187 lesson: the stderr bench-top
    // window truncated EXACTLY the anomalous row's GC column, so the
    // 3×-inflation class gets its adjudication data via a channel
    // that cannot truncate per-row.
    def teleJson(r: QRes): String = {
      val all = r.samples
      "{\"all\":[" + all.map(s => f"${s.sec}%.3f").mkString(",") + "]" +
        ",\"rload\":[" + all.map(s => f"${s.load}%.1f").mkString(",") + "]" +
        ",\"rfree\":[" + all.map(_.freeMb).mkString(",") + "]" +
        ",\"rgcMs\":[" + all.map(_.tele._1).mkString(",") + "]" +
        ",\"rsrMb\":[" + all.map(s => mb(s.tele._2)).mkString(",") + "]" +
        ",\"rswMb\":[" + all.map(s => mb(s.tele._3)).mkString(",") + "]" +
        ",\"rspillMb\":[" + all.map(s => mb(s.tele._4)).mkString(",") + "]" +
        ",\"rpeakMb\":[" + all.map(s => mb(s.tele._5)).mkString(",") + "]" +
        ",\"rstealPct\":[" + all.map(s => f"${s.steal}%.1f").mkString(",") + "]" +
        ",\"rotherPct\":[" + all.map(s => f"${s.other}%.1f").mkString(",") + "]" +
        ",\"rsettled\":[" + all.map(s => if (s.settled) 1 else 0).mkString(",") + "]" +
        (if (r.dropped.isEmpty) ""
        else
          ",\"rdropSec\":[" + r.dropped.map(s => f"${s.sec}%.3f").mkString(",") + "]" +
            ",\"rdropSteal\":[" + r.dropped.map(s => f"${s.steal}%.1f").mkString(",") + "]" +
            ",\"rdropOther\":[" + r.dropped.map(s => f"${s.other}%.1f").mkString(",") + "]") +
        (if (r.contended) ",\"contended\":1" else "") + "}"
    }
    val topJson = results.filter(_.median >= 5.0).sortBy(-_.median)
      .map { r =>
        "\"" + r.name + "\":{\"median\":" + f"${r.median}%.3f" + "," +
          teleJson(r).drop(1)
      }.mkString("{", ",", "}")
    val fileLine = line.dropRight(1) + s""","top":$topJson}"""
    // Capture-window budget: the driver keeps ~2000 chars of stdout. Per
    // emitted query the line spends len("\"NNN\":N.N,") ≈ 10 chars
    // (numeric keys + 1dp); the sub-0.15 s tail (~39 queries, r9) folds
    // into the fixed-cost "tail" envelope key, so headroom is ~215
    // registry queries (r10 — measured 1813 chars at 181 queries
    // without the fold); the fixed envelope is ~160 chars.
    // Past 1950 the stdout copy DEGRADES to the envelope + a pointer
    // (per-query medians remain in bench_result.json /
    // bench_detail.json, which always carry the full line) rather than
    // risking a truncated-JSON capture the driver can't parse.
    val stdoutLine =
      if (line.length <= 1950) line
      else {
        System.err.println(s"[bench] metric line ${line.length} chars " +
          "exceeds the ~2000-char capture window — emitting total-only " +
          "on stdout; per-query medians in bench_result.json")
        f"""{"metric":"total","value":$total%.3f,"unit":"sec","runs":$repeats,$env,$tailJson,"queries":{},"queries_in":"bench_result.json","sf":"$sfName"}"""
      }
    // Belt and braces for the driver's parser: the bare line on stdout
    // (build.sbt routes forked output past sbt's `[info]` logger) AND a
    // file copy it can read regardless of how the tail is captured. The
    // stdout line is the primary channel — print it FIRST so a failed
    // file write (read-only cwd) can't suppress it.
    println(stdoutLine)
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_result.json"),
        (fileLine + "\n").getBytes("UTF-8"))
      // full-precision per-query samples for BASELINE.md adjudication;
      // "all"/"rload"/"rfree" are in CAPTURE ORDER (see the sampling
      // comment above), not sorted
      // per-repeat JVM/stage telemetry (capture order, like "all"):
      // GC ms, shuffle read/write MB, spill MB, peak execution-memory
      // MB — the q166-class driver-row adjudication data (r12) —
      // plus rsettled (0 = the telemetry bus was still draining at
      // the 1 s cap, counters may bleed into the next repeat)
      val detail = (results.map { r =>
        "\"" + r.name + "\":{\"median\":" + f"${r.median}%.3f" +
          ",\"min\":" + f"${r.min}%.3f" + "," + teleJson(r).drop(1)
        // cpus is quoted: SPARK_GRAFT_CPUS="*" is a legitimate setting
        // (local[*]) that would otherwise emit unparseable JSON
      } :+ s""""__env":{$env,"cpus":"$cpus"}""").mkString("{", ",", "}")
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_detail.json"),
        (detail + "\n").getBytes("UTF-8"))
      // cid-suffixed copy (VERDICT r14 #5): the round-14 shipped
      // capture's detail was overwritten by later probes before it
      // was round-stamped — the per-cid copy makes every capture's
      // detail recoverable until the round stamp lands
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"bench_detail.$captureId.json"),
        (detail + "\n").getBytes("UTF-8"))
    } catch { case e: Exception =>
      System.err.println(s"[bench] bench files not written: $e")
    }
    // the listener is registered on a per-JVM bus: leaving it behind
    // accumulates dead listeners across runBench invocations in one
    // JVM (ADVICE r12)
    spark.sparkContext.removeSparkListener(telemetry)
    spark.stop()
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** r16 optimization-round contracts that don't need a SparkSession:
  * the sized-broadcast crossovers for per-round iterative state
  * (Graph.powerRounds / DistributedLogReg — the triangleCounts
  * auto-broadcast pattern applied to rank/probability frames) and the
  * scratch-placement invariants (spark.local.dir must live under the
  * self-cleaning Scratch root so a killed run cannot leak tmpfs RAM,
  * and artifact dirs must share that root so the shutdown hook covers
  * everything). */
class ScratchPlacementSpec extends AnyFunSuite {

  test("ranksFitBroadcast crossover: 256 MB budget admits ~5.6M nodes " +
      "and refuses a billion-node graph") {
    assert(graft.operators.Graph.ranksFitBroadcast(21000L))
    assert(graft.operators.Graph.ranksFitBroadcast(5_000_000L))
    assert(!graft.operators.Graph.ranksFitBroadcast(6_000_000L))
    assert(!graft.operators.Graph.ranksFitBroadcast(1_000_000_000L))
    // the budget is a parameter, not a constant: a tighter budget
    // refuses earlier, a looser one admits more
    assert(!graft.operators.Graph.ranksFitBroadcast(21000L,
      budgetBytes = 1024L))
    assert(graft.operators.Graph.ranksFitBroadcast(1_000_000_000L,
      budgetBytes = 64L << 30))
  }

  test("logreg probability-frame broadcast budget admits the corpus " +
      "doc counts and refuses web-scale ones") {
    val budget = graft.ml.DistributedLogReg.DefaultProbBroadcastBytes
    assert(48L * 5000 <= budget)          // the gated corpus
    assert(48L * 5_000_000 <= budget)     // a large-but-bounded corpus
    assert(48L * 1_000_000_000L > budget) // a 100 TB doc table degrades
  }

  test("spark.local.dir lives under the self-cleaning Scratch root") {
    val local = java.nio.file.Paths.get(Scratch.sparkLocalDir)
      .toAbsolutePath.normalize
    val sibling = java.nio.file.Paths.get(Scratch.dir("placement_probe_"))
      .toAbsolutePath.normalize
    // both come from the same root: their parents match, so the
    // shutdown hook that deletes the root covers the block-manager dir
    assert(local.getParent === sibling.getParent,
      s"$local and $sibling must share the Scratch root")
    assert(java.nio.file.Files.isDirectory(local))
  }

  test("the scratch root prefers a writable /dev/shm when no override " +
      "is set AND the RAM-headroom gate passes, and stays usable " +
      "either way") {
    val d = java.nio.file.Paths.get(Scratch.dir("placement_tier_"))
    assert(java.nio.file.Files.isWritable(d))
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (sys.env.get("SPARK_GRAFT_SCRATCH_DIR").isEmpty &&
        java.nio.file.Files.isDirectory(shm) &&
        java.nio.file.Files.isWritable(shm) &&
        Scratch.tmpfsHeadroomOk(Scratch.memAvailableBytes(),
          Runtime.getRuntime.maxMemory)) {
      assert(d.toAbsolutePath.toString.startsWith("/dev/shm/"),
        s"expected tmpfs-backed scratch, got $d")
    }
  }

  test("tmpfs headroom gate (r17, VERDICT r16 #2): RAM-rich hosts " +
      "pass, heap-sized-to-container executors land on disk") {
    val g = 1L << 30
    // this sandbox: ~120 GiB available next to an 8 GiB heap — tmpfs
    assert(Scratch.tmpfsHeadroomOk(120 * g, 8 * g))
    // a production executor: 56 GiB heap in a 64 GiB container — the
    // gate refuses (shuffle spill exists because memory ran out;
    // RAM-backed spill there would evict page cache / court the
    // OOM killer)
    assert(!Scratch.tmpfsHeadroomOk(8 * g, 56 * g))
    // boundary: exactly factor × heap passes, one byte less fails
    assert(Scratch.tmpfsHeadroomOk(
      Scratch.TmpfsHeadroomFactor * 8 * g, 8 * g))
    assert(!Scratch.tmpfsHeadroomOk(
      Scratch.TmpfsHeadroomFactor * 8 * g - 1, 8 * g))
    // a /proc/meminfo read failure reads as -1 → conservative (disk)
    assert(!Scratch.tmpfsHeadroomOk(-1L, 8 * g))
    // the live read on this Linux host yields a positive number
    assert(Scratch.memAvailableBytes() > 0)
  }
}

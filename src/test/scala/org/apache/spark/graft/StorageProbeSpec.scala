package org.apache.spark.graft

import org.apache.spark.scheduler.{SparkListenerBlockUpdated, SparkListenerUnpersistRDD}
import org.apache.spark.storage.{BlockManagerId, BlockUpdatedInfo, BroadcastBlockId, RDDBlockId, StorageLevel}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the semantics of the BENCH_DETAIL storage columns
  * (graft.StorageProbe): high-water is the WINDOWED peak of live RDD
  * memory, `evicted_blocks` counts pressure drops only (an explicit
  * unpersist is lifecycle, not pressure), and `block_readds` is the
  * recompute/reload signature a warm-reads-like-cold row needs to be
  * adjudicable from the artifact. Synthetic listener events — the spec
  * lives in an org.apache.spark subpackage purely so it can construct
  * BlockManagerId; the probe itself consumes only public listener API. */
class StorageProbeSpec extends AnyFunSuite {

  private def ev(probe: graft.StorageProbe, rdd: Int, split: Int, mem: Long,
      disk: Long = 0L,
      lvl: StorageLevel = StorageLevel.MEMORY_AND_DISK): Unit =
    probe.onBlockUpdated(SparkListenerBlockUpdated(BlockUpdatedInfo(
      BlockManagerId("e", "h", 1), RDDBlockId(rdd, split), lvl, mem, disk)))

  test("high-water is the windowed peak of live RDD memory, not the endpoint") {
    val p = new graft.StorageProbe
    val base = p.begin()
    ev(p, 1, 0, 100L << 20)
    ev(p, 1, 1, 100L << 20)
    ev(p, 2, 0, 50L << 20)
    p.onUnpersistRDD(SparkListenerUnpersistRDD(1))
    val (hw, evicted, readds) = p.read(base)
    assert(hw == 250, s"peak was 250 MB, read $hw")
    assert(evicted == 0 && readds == 0)
    // a NEW window never inherits the old peak: live total is 50 MB now
    val base2 = p.begin()
    val (hw2, _, _) = p.read(base2)
    assert(hw2 == 50, s"fresh window high-water must restart at live total, read $hw2")
  }

  test("explicit unpersist never counts as eviction, even with trailing block removals") {
    val p = new graft.StorageProbe
    val base = p.begin()
    ev(p, 3, 0, 10L << 20)
    p.onUnpersistRDD(SparkListenerUnpersistRDD(3))
    // the BlockManager's async removals arrive AFTER the unpersist
    // event (FIFO bus) — they must stay silent
    ev(p, 3, 0, 0L, lvl = StorageLevel.NONE)
    val (_, evicted, readds) = p.read(base)
    assert(evicted == 0 && readds == 0,
      s"lifecycle release misread as pressure: evicted=$evicted readds=$readds")
  }

  test("pressure drop counts once; the re-add is the recompute signature") {
    val p = new graft.StorageProbe
    val base = p.begin()
    ev(p, 4, 0, 10L << 20)
    ev(p, 4, 1, 10L << 20)
    // block 0 dropped to disk under memory pressure (level still valid)
    ev(p, 4, 0, 0L, disk = 10L << 20)
    val (_, e1, r1) = p.read(base)
    assert(e1 == 1 && r1 == 0)
    // the block comes back into memory — recompute or disk reload,
    // either way the cost signature the columns exist to expose
    ev(p, 4, 0, 10L << 20)
    val (_, e2, r2) = p.read(base)
    assert(e2 == 1 && r2 == 1, s"evicted=$e2 readds=$r2")
    // a fresh window subtracts the baselines
    val base2 = p.begin()
    val (_, e3, r3) = p.read(base2)
    assert(e3 == 0 && r3 == 0)
  }

  test("non-RDD blocks are ignored entirely") {
    val p = new graft.StorageProbe
    val base = p.begin()
    p.onBlockUpdated(SparkListenerBlockUpdated(BlockUpdatedInfo(
      BlockManagerId("e", "h", 1), BroadcastBlockId(7L),
      StorageLevel.MEMORY_AND_DISK, 500L << 20, 0L)))
    val (hw, evicted, _) = p.read(base)
    assert(hw == 0 && evicted == 0)
  }

  test("re-persist after unpersist reopens the lifecycle (drops can flag again)") {
    val p = new graft.StorageProbe
    val base = p.begin()
    ev(p, 5, 0, 10L << 20)
    p.onUnpersistRDD(SparkListenerUnpersistRDD(5))
    ev(p, 5, 0, 0L, lvl = StorageLevel.NONE) // silent: lifecycle
    ev(p, 5, 0, 10L << 20)                   // re-persisted
    ev(p, 5, 0, 0L, disk = 10L << 20)        // pressure drop — must count
    val (_, evicted, _) = p.read(base)
    assert(evicted == 1, s"re-persisted RDD's pressure drop must flag, read $evicted")
  }
}

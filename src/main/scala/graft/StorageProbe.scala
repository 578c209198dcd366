package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerBlockUpdated, SparkListenerUnpersistRDD}
import org.apache.spark.storage.RDDBlockId

import scala.collection.concurrent.TrieMap

/** Storage-lifecycle probe behind BENCH_DETAIL's per-query
  * `storage_hw_mb` / `evicted_blocks` / `block_readds` columns
  * (r14 verdict #1: the driver box read the token/shingle family hot
  * two rounds running, with a `Block rdd_* already exists` recompute
  * signature in the tail — the eviction-vs-contention question must be
  * adjudicable FROM THE ARTIFACT, not argued after the fact).
  *
  * Semantics, from the listener event stream (delivered serially, so
  * no intra-probe races beyond the reader thread):
  *
  *  - `storage high-water`: max over time of Σ memSize of live RDD
  *    blocks, within a [[begin]]/[[read]] window — the number to hold
  *    against the storage pool when asking "was this suite run into
  *    eviction territory?". (The post-warm `cache_mb` snapshot Bench
  *    already records is an endpoint, blind to mid-query peaks.)
  *  - `evicted_blocks`: transitions of a block from >0 bytes in memory
  *    to 0 while its RDD is still persisted — i.e. dropped by storage
  *    pressure (to disk or entirely), NEVER counted for an explicit
  *    `unpersist` (the release discipline must not read as pressure;
  *    [[onUnpersistRDD]] retires the RDD's blocks silently).
  *  - `block_readds`: a previously-dropped block coming back into
  *    memory — the recompute/disk-reload signature that makes a warm
  *    number read like a cold one. evicted>0 with readds>0 says the
  *    measurement re-derived evicted state; evicted>0 readds=0 says
  *    pressure existed but nothing was re-paid inside the window.
  */
final class StorageProbe extends SparkListener {
  private val memBytes = TrieMap.empty[RDDBlockId, Long]
  private val dropped = TrieMap.empty[RDDBlockId, Unit]
  private val unpersisted = TrieMap.empty[Int, Unit]
  private val total = new AtomicLong(0)
  private val hw = new AtomicLong(0)
  private val evict = new AtomicLong(0)
  private val readd = new AtomicLong(0)

  override def onBlockUpdated(e: SparkListenerBlockUpdated): Unit =
    e.blockUpdatedInfo.blockId match {
      case id: RDDBlockId =>
        val info = e.blockUpdatedInfo
        val newMem = if (info.storageLevel.isValid) info.memSize else 0L
        val prev =
          if (newMem > 0) memBytes.put(id, newMem) else memBytes.remove(id)
        val delta = newMem - prev.getOrElse(0L)
        if (delta != 0) {
          val t = total.addAndGet(delta)
          var cur = hw.get
          while (t > cur && !hw.compareAndSet(cur, t)) cur = hw.get
        }
        if (newMem > 0) {
          // a re-persist after unpersist reopens the RDD's lifecycle
          unpersisted.remove(id.rddId)
          if (dropped.remove(id).isDefined) readd.incrementAndGet()
        } else if (prev.exists(_ > 0) && !unpersisted.contains(id.rddId)) {
          evict.incrementAndGet()
          dropped.put(id, ())
        }
      case _ => ()
    }

  /** Explicit release: retire the RDD's tracking without counting its
    * block removals as evictions (the removals may arrive after this
    * event — the bus is FIFO, so marking first is enough). */
  override def onUnpersistRDD(e: SparkListenerUnpersistRDD): Unit = {
    unpersisted.put(e.rddId, ())
    memBytes.keysIterator.filter(_.rddId == e.rddId).foreach { id =>
      memBytes.remove(id).foreach(b => total.addAndGet(-b))
    }
    dropped.keysIterator.filter(_.rddId == e.rddId)
      .foreach(dropped.remove)
  }

  /** Open a measurement window: high-water restarts from the CURRENT
    * live total (so a window never inherits the previous query's
    * peak); returns the counter baselines [[read]] subtracts. */
  def begin(): (Long, Long) = {
    hw.set(total.get)
    (evict.get, readd.get)
  }

  /** (high-water MB within the window, evictions, re-adds). */
  def read(baseline: (Long, Long)): (Long, Long, Long) =
    (hw.get >> 20, evict.get - baseline._1, readd.get - baseline._2)
}

package graft

import graft.operators.Components
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: (Long, Long)*): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two chains and an isolated edge resolve to min-id components") {
    val got = cc((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (9L, 10L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 5L, 6L -> 5L, 8L -> 8L, 9L -> 8L, 10L -> 8L))
  }

  test("a path graph longer than one hop converges (propagation, not one-step)") {
    val edges = (1L until 12L).map(i => (i, i + 1))
    val got = cc(edges: _*)
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == (1L to 12L).toSet)
  }

  test("cycles terminate and label with the cycle minimum") {
    val got = cc((4L, 7L), (7L, 9L), (9L, 4L))
    assert(got == Map(4L -> 4L, 7L -> 4L, 9L -> 4L))
  }

  test("duplicate and reversed edges don't change the result") {
    val got = cc((2L, 1L), (1L, 2L), (2L, 1L), (3L, 2L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("loop parallelism is restored on success AND on the round-cap throw") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    Components.connectedComponentsAlternating(
      Seq((1L, 2L), (2L, 3L)).toDF("a", "b"), "a", "b")
    assert(spark.conf.get(key) == before, "success path must restore the session value")
    intercept[IllegalArgumentException] {
      // maxIter=0 with a non-empty graph: the require fires before any
      // round — the failure path must still restore the conf and
      // release the loop's storage (finally)
      Components.connectedComponentsAlternating(
        Seq((1L, 2L)).toDF("a", "b"), "a", "b", maxIter = 0)
    }
    assert(spark.conf.get(key) == before, "failure path must restore the session value")
  }

  test("component ids are always a member's id (the minimum)") {
    val got = cc((10L, 20L), (30L, 20L), (40L, 50L))
    got.foreach { case (_, comp) => assert(got.contains(comp)) }
    assert(got(10L) == 10L && got(30L) == 10L && got(40L) == 40L)
  }

  test("an empty edge list returns an empty frame (clean corpus, no pairs)") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Components.connectedComponents(empty, "a", "b").isEmpty)
  }

  test("hitting the round cap fails loudly instead of returning pseudo-components") {
    val path = (1L until 10L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Components.connectedComponents(path, "a", "b", maxIter = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  // ── large-star/small-star (the O(log n) scale path) ────────────────

  private def ccAlt(edges: (Long, Long)*): Map[Long, Long] =
    Components.connectedComponentsAlternating(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("alternating == min-label on random edge lists (cross-implementation)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val n = 20 + trial * 10
      val edges = Seq.fill(n)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter { case (x, y) => x != y }
      assert(ccAlt(edges: _*) == cc(edges: _*), s"trial $trial diverged")
    }
  }

  test("alternating resolves a 100-node path within its O(log n) round budget") {
    // min-label would need ~99 rounds here; the stars need ~log2(100)
    val edges = (1L until 100L).map(i => (i, i + 1))
    val got = ccAlt(edges: _*)
    assert(got.keySet == (1L to 100L).toSet)
    assert(got.values.toSet == Set(1L))
  }

  test("alternating handles empty input and self-loop-only nodes") {
    assert(ccAlt() == Map.empty)
    assert(ccAlt((7L, 7L)) == Map(7L -> 7L))
    assert(ccAlt((7L, 7L), (1L, 2L)) == Map(7L -> 7L, 1L -> 1L, 2L -> 1L))
  }

  test("both implementations match an independent union-find ground truth") {
    // driver-side union-find: shares no code or algorithmic idea with
    // either distributed implementation, so a bug correlated between
    // the two (they share the min-id convention) can't hide here
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (x, y) =>
        val (rx, ry) = (find(x), find(y))
        if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
      }
      // min-id root: path-compress once more, then relabel by the
      // component's true minimum member
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val byRoot = nodes.groupBy(find)
      byRoot.flatMap { case (_, members) =>
        val m = members.min
        members.map(_ -> m)
      }
    }
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val edges = Seq.fill(60 + trial * 20)(
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      val truth = unionFind(edges)
      assert(ccAlt(edges: _*) == truth, s"alternating vs union-find, trial $trial")
      assert(cc(edges: _*) == truth, s"min-label vs union-find, trial $trial")
    }
  }
}

package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Unit spec for the interval-set algebra behind page pruning
  * (`PageSource.capRanges` / `intersectRanges`) — the merge branches
  * (adjacency, MaxValue tails, full-line collapse, the 64-interval
  * envelope cap) are easy to get subtly wrong, and a wrong MERGE here
  * would silently widen or narrow the pruning cover. PageSourceSpec
  * pins the end-to-end behavior; this pins the algebra, including a
  * seeded randomized cover-equivalence check. */
class PageRangeSpec extends AnyFunSuite {
  private val Min = Long.MinValue
  private val Max = Long.MaxValue
  private def cap(rs: (Long, Long)*) = PageSource.capRanges(rs)

  test("merge: overlap, adjacency, containment, and unsorted input") {
    assert(cap((1L, 5L), (4L, 9L)) == Seq((1L, 9L)), "overlap merges")
    assert(cap((1L, 5L), (6L, 9L)) == Seq((1L, 9L)), "adjacent merges")
    assert(cap((1L, 5L), (7L, 9L)) == Seq((1L, 5L), (7L, 9L)), "gap stays split")
    assert(cap((7L, 9L), (1L, 5L)) == Seq((1L, 5L), (7L, 9L)), "input order irrelevant")
    assert(cap((1L, 20L), (5L, 9L)) == Seq((1L, 20L)), "containment collapses")
  }

  test("boundary arithmetic: MaxValue tails never overflow, full line collapses") {
    // an interval reaching MaxValue absorbs everything after it (the
    // mh+1 adjacency probe must not wrap)
    assert(cap((10L, Max), (20L, 30L)) == Seq((10L, Max)))
    assert(cap((10L, Max), (Max, Max)) == Seq((10L, Max)))
    // any full-line member normalizes to THE FullRange instance shape
    assert(cap((Min, Max), (5L, 5L)) == PageSource.FullRange)
    assert(cap((5L, 5L), (Min, Max)) == PageSource.FullRange)
    // a set that merges INTO the full line also normalizes
    assert(cap((Min, 0L), (1L, Max)) == PageSource.FullRange)
    assert(cap() == Seq.empty, "empty in, empty out")
  }

  test("cap at 64: wide sets collapse to their envelope (superset, never narrower)") {
    val points = (0 until 200).map(i => (i * 10L, i * 10L))
    val out = PageSource.capRanges(points)
    assert(out == Seq((0L, 1990L)), s"envelope fallback, got $out")
    // exactly-64 disjoint intervals survive uncollapsed
    val sixtyFour = (0 until 64).map(i => (i * 10L, i * 10L + 1L))
    assert(PageSource.capRanges(sixtyFour) == sixtyFour)
  }

  test("intersect: pairwise, empty on disjoint, identity on full") {
    assert(PageSource.intersectRanges(Seq((1L, 10L)), Seq((5L, 20L))) == Seq((5L, 10L)))
    assert(PageSource.intersectRanges(Seq((1L, 4L)), Seq((5L, 20L))) == Seq.empty)
    assert(PageSource.intersectRanges(PageSource.FullRange, Seq((5L, 9L))) == Seq((5L, 9L)))
    // two unions intersect piecewise: ([0,10]∪[20,30]) ∩ ([5,25]) =
    // [5,10] ∪ [20,25]
    assert(PageSource.intersectRanges(Seq((0L, 10L), (20L, 30L)), Seq((5L, 25L))) ==
      Seq((5L, 10L), (20L, 25L)))
  }

  test("randomized cover equivalence: capRanges preserves membership (seeded)") {
    val rnd = new scala.util.Random(20260816L)
    (0 until 200).foreach { _ =>
      val n = 1 + rnd.nextInt(12)
      val rs = Seq.fill(n) {
        val lo = rnd.nextInt(1000).toLong
        (lo, lo + rnd.nextInt(50).toLong)
      }
      val out = PageSource.capRanges(rs)
      // sorted, disjoint, non-adjacent
      out.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(h1 + 1 < l2, s"not normalized: $out")
        case _ => ()
      }
      // membership identical for every probed point (cap ≤ 64 never
      // fires at n ≤ 12, so this is EXACT equivalence, not superset)
      (0L until 1100L by 7L).foreach { p =>
        val inRaw = rs.exists { case (l, h) => l <= p && p <= h }
        val inOut = out.exists { case (l, h) => l <= p && p <= h }
        assert(inRaw == inOut, s"point $p: raw=$inRaw out=$inOut rs=$rs out=$out")
      }
    }
  }
}

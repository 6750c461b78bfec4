package graft

import graft.ops.RangeJoin

/** The grid overlap join's pair semantics (iv1's operator): half-open
  * interval intersection, exactly-once emission for pairs spanning several
  * shared grid cells, and brute-force agreement on seeded random inputs.
  * (grid()'s point-in-interval face is pinned by rj1's registry oracle.)
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairsOf(a: Seq[(Long, Double, Double)],
      b: Seq[(Long, Double, Double)], cellSize: Double): Seq[(Long, Long)] =
    RangeJoin.overlap(
      a.toDF("a_id", "a_lo", "a_hi"), b.toDF("b_id", "b_lo", "b_hi"),
      "a_lo", "a_hi", "b_lo", "b_hi", cellSize)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("overlap: half-open semantics, containment, and multi-cell dedup") {
    // cell size 10. a1 spans 3 cells and overlaps b1 in several shared
    // cells — must emit ONCE. a2/b2 touch end-to-start (half-open: no
    // overlap). b3 is contained entirely inside a1.
    val a = Seq((1L, 5.0, 35.0), (2L, 40.0, 50.0))
    val b = Seq((1L, 8.0, 32.0), (2L, 50.0, 60.0), (3L, 12.0, 13.0))
    val got = pairsOf(a, b, cellSize = 10.0)
    assert(got.sorted == Seq((1L, 1L), (1L, 3L)),
      s"expected exactly {a1-b1, a1-b3} once each, got $got")
  }

  test("overlap: empty intervals intersect nothing") {
    // [15, 15) is the empty set — the raw predicate lo1 < hi2 AND lo2 < hi1
    // would match it against [10, 20); the operator must not
    val a = Seq((1L, 15.0, 15.0), (2L, 30.0, 25.0)) // empty + inverted
    val b = Seq((1L, 10.0, 20.0), (2L, 20.0, 40.0))
    assert(pairsOf(a, b, cellSize = 10.0).isEmpty)
    // and symmetric: an empty right side matches nothing either
    assert(pairsOf(b.map(x => (x._1, x._2, x._3)), a, cellSize = 10.0).isEmpty)
  }

  test("overlap: brute-force agreement on seeded random intervals") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      val a = (1L to 40L).map { i =>
        val lo = rnd.nextDouble() * 100; (i, lo, lo + rnd.nextDouble() * 30)
      }
      val b = (1L to 40L).map { i =>
        val lo = rnd.nextDouble() * 100; (i, lo, lo + rnd.nextDouble() * 30)
      }
      val want = (for {
        (ai, alo, ahi) <- a; (bi, blo, bhi) <- b
        if alo < ahi && blo < bhi // non-empty (the operator's contract)
        if alo < bhi && blo < ahi
      } yield (ai, bi)).sorted
      // deliberately mismatched cell size (intervals up to 30 wide, cells
      // of 7): most pairs share several cells — the dedup rule is load-bearing
      val got = pairsOf(a, b, cellSize = 7.0).sorted
      assert(got == want, s"trial $trial: ${got.size} vs ${want.size} pairs")
    }
  }
}

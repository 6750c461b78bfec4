package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** The adaptive connected-components router (round-8 verdict item #7):
  * min-label propagation for the shallow clusters near-dup corpora
  * actually produce, with an automatic re-route to star contraction when
  * the label churn stops decaying — the chain-shaped pathology where
  * propagation needs O(diameter) rounds.
  */
class CcRouteSpec extends SparkSpec {

  private def pairsOf(ps: Seq[(Long, Long)]) = {
    import spark.implicits._
    ps.toDF("a", "b")
  }

  test("chain graph: the star re-route engages and labels stay exact") {
    // doc i pairs only with i+1 — a 300-deep chain. Propagation alone
    // would need 300 rounds (the default maxIter=10 would NOT converge);
    // the router must detect the non-decaying churn and finish with star
    // contraction.
    val chain = pairsOf((1L until 300L).map(i => (i, i + 1)))
    val (labels, routed) = Dedup.ccAutoRouted(chain)
    assert(routed, "chain-shaped churn must trigger the star re-route")
    val rows = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length === 300)
    assert(rows.forall(_._2 == 1L), "every chain member must label to the min id")
  }

  test("shallow star clusters: propagation converges, no re-route") {
    // three star-shaped clusters — the common near-dup shape; churn
    // collapses after round one, so the router must stay on propagation
    val stars = pairsOf(
      (2L to 40L).map(i => (1L, i)) ++
        (102L to 140L).map(i => (101L, i)) ++
        (202L to 240L).map(i => (201L, i)))
    val (labels, routed) = Dedup.ccAutoRouted(stars)
    assert(!routed, "shallow clusters must not pay the star machinery")
    val byCluster = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).view.mapValues(_.length).toMap
    assert(byCluster === Map(1L -> 40, 101L -> 40, 201L -> 40))
  }

  test("auto route agrees with both fixed algorithms on a mixed graph") {
    // chains + stars + a singleton pair: all three resolvers must produce
    // identical labelings (min reachable id per node)
    val mixed = pairsOf(
      (1L until 80L).map(i => (i, i + 1)) ++         // a chain
        (502L to 520L).map(i => (501L, i)) ++        // a star
        Seq((900L, 901L)))                           // a pair
    val auto = Dedup.connectedComponentsAuto(mixed)
    val prop = Dedup.connectedComponents(mixed, maxIter = 100)
    val star = Dedup.connectedComponentsStar(mixed)
    assert(auto.exceptAll(prop).count() == 0 && prop.exceptAll(auto).count() == 0,
      "auto vs propagation disagree")
    assert(auto.exceptAll(star).count() == 0 && star.exceptAll(auto).count() == 0,
      "auto vs star disagree")
  }
}

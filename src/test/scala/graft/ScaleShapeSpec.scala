package graft

/** Plan-shape stability ACROSS SCALES for the scale-stress headline set:
  * the same query planned against sf0.001 and sf0.01 (a 10x span) must not
  * grow any quadratic join — the failure mode where a side that
  * broadcast at toy scale silently plans a CartesianProduct /
  * BroadcastNestedLoopJoin once it outgrows the threshold. Broadcast→
  * shuffled-join flips are legitimate scale adaptation and are NOT
  * forbidden here; quadratic growth is. The measured 10x run
  * (graft.ScaleStress → SCALE_PROOF.md) applies the same check, via the
  * same ScaleStress.shapeOf definition, at sf0.1 vs 10x-replicated sf0.1.
  */
class ScaleShapeSpec extends SparkSpec {

  private val quadratic = Seq("CartesianProduct", "BroadcastNestedLoopJoin")

  test("headline queries plan no NEW quadratic join at 10x the scale") {
    val small = "/root/testdata/sf0.001"
    val big = "/root/testdata/sf0.01"
    ScaleStress.headline.foreach { name =>
      val fn = SparkEntry.queries(name)
      val sSmall = ScaleStress.shapeOf(fn(spark, small).queryExecution.sparkPlan.toString)
      val sBig = ScaleStress.shapeOf(fn(spark, big).queryExecution.sparkPlan.toString)
      quadratic.foreach { n =>
        assert(sBig.getOrElse(n, 0) <= sSmall.getOrElse(n, 0),
          s"$name grew a $n at the larger scale: small=$sSmall big=$sBig")
      }
    }
  }

  test("the headline set stays registered (ScaleStress depends on it)") {
    ScaleStress.headline.foreach { name =>
      assert(SparkEntry.queries.contains(name), s"$name left the registry")
    }
  }
}

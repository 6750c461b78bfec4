package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Losslessness of the pigeonhole blocking in [[Dedup.editDistanceJoin]]
  * (ld2): adversarial shift cases a naive same-position blocking would
  * miss, and exact equality against the quadratic join on a real fixture.
  */
class FuzzyJoinSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)], d: Int = 2) = {
    import spark.implicits._
    Dedup.editDistanceJoin(rows.toDF("id", "s"), "id", "s", d, 20)
      .select("a", "b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("shifted edits (insert/delete) are found — the pigeonhole windows earn their ±d") {
    val base = "abcdefghijklmnopqrst" // 20 chars, all distinct
    val rows = Seq(
      1L -> base,
      // delete the FIRST char, append one: every segment shifts left by 1 —
      // same-position blocking finds no equal segment, the window does
      // (equal length caps ed<=2 at one del + one ins, so shift 1 is the
      // maximal reachable shift; the ±d windows are a safe superset)
      2L -> (base.drop(1) + "u"),
      // delete inside segment 2, append at the end: segments 2..3 shift
      // left by 1 while segment 1 stays aligned
      3L -> (base.take(9) + base.drop(10) + "u"),
      // substitution only, no shift
      4L -> ("X" + base.drop(1)),
      // distance 6 (3-shift) — must NOT appear
      5L -> (base.drop(3) + "uvw"))
    val got = run(rows)
    val pairs = got.map { case (a, b, _) => (a, b) }
    assert(pairs.contains((1L, 2L)), s"missed the front-shift pair: $got")
    assert(pairs.contains((1L, 3L)), s"missed the mid-shift pair: $got")
    assert(pairs.contains((1L, 4L)), s"missed the substitution pair: $got")
    assert(!pairs.contains((1L, 5L)), s"distance-6 pair leaked: $got")
    assert(got.find { case (a, b, _) => (a, b) == (1L, 2L) }.get._3 == 2L)
  }

  test("equals the quadratic join on the sf0.001 fixture") {
    val t = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), substring(col("text"), 1, 20).as("pre"))
    val blocked = Dedup.editDistanceJoin(t, "doc_id", "pre", 2, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = t.select(col("doc_id").as("a"), col("pre").as("pa"))
    val b = t.select(col("doc_id").as("b"), col("pre").as("pb"))
    val truth = a.crossJoin(b).filter(col("a") < col("b"))
      .filter(levenshtein(col("pa"), col("pb")) <= 2)
      .select(col("a"), col("b"),
        levenshtein(col("pa"), col("pb")).cast("bigint").as("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(blocked == truth,
      s"blocked missed ${truth -- blocked}, extra ${blocked -- truth}")
  }
}

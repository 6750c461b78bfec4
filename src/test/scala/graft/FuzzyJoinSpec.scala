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

  private def runVar(rows: Seq[(Long, String)], d: Int = 2) = {
    import spark.implicits._
    Dedup.editDistanceJoinVarLen(rows.toDF("id", "s"), "id", "s", d)
      .select("a", "b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("varlen: true insert/delete pairs across different lengths are found") {
    val base = "abcdefghijklmnopqrst" // len 20
    val rows = Seq(
      1L -> base,
      2L -> base.drop(2),            // len 18: two leading deletes, dist 2
      3L -> (base + "uv"),           // len 22: two appends, dist 2
      4L -> ("XY" + base),           // len 22: two prepends — every segment shifts
      5L -> base.drop(3),            // len 17: dist 3, must NOT pair with 1
      6L -> (base.take(10) + "Z" + base.drop(10))) // len 21: mid-insert, dist 1
    val got = runVar(rows).map { case (a, b, _) => (a, b) }
    assert(got.contains((1L, 2L)), s"missed leading-delete pair: $got")
    assert(got.contains((1L, 3L)), s"missed append pair: $got")
    assert(got.contains((1L, 4L)), s"missed prepend (full-shift) pair: $got")
    assert(got.contains((1L, 6L)), s"missed mid-insert pair: $got")
    assert(!got.contains((1L, 5L)), s"distance-3 pair leaked: $got")
  }

  test("varlen: short keys (< 2(d+1)) pair via the length band, incl. cross-band") {
    val rows = Seq(
      1L -> "ab",       // len 2
      2L -> "axb",      // len 3, dist 1 from "ab"
      3L -> "ab",       // exact dup of 1
      4L -> "abcd",     // len 4, dist 2 from "ab"
      5L -> "abcdefg",  // len 7 (overlap band for d=2: [6,7])
      6L -> "abcdefghi",// len 9 (long route), dist 2 from 5
      7L -> "qrstu")    // len 5, far from everything
    val got = runVar(rows).map { case (a, b, _) => (a, b) }
    assert(got.contains((1L, 2L)), s"missed len-2/3 pair: $got")
    // empty strings are legal keys: ("", x) with len(x) <= d is a true pair
    val withEmpty = runVar(Seq(1L -> "", 2L -> "ab", 3L -> "abc"))
      .map { case (a, b, _) => (a, b) }
    assert(withEmpty === Set((1L, 2L), (2L, 3L)),
      s"empty-string pairs wrong: $withEmpty")
    assert(got.contains((1L, 3L)), s"missed exact short dup: $got")
    assert(got.contains((1L, 4L)), s"missed dist-2 short pair: $got")
    assert(got.contains((5L, 6L)), s"missed overlap-band x long pair: $got")
    assert(!got.exists(p => p._1 == 7L || p._2 == 7L), s"false pair on 7: $got")
  }

  test("pair-volume guard: oversized join keys star-link, exact elsewhere") {
    import spark.implicits._
    // one boilerplate cluster (shared 20-char string -> every segment key's
    // product explodes past the tiny cap) + one clean pair elsewhere
    val hot = (1L to 8L).map(i => i -> "aaaaaaaaaaaaaaaaaaaa")
    val clean = Seq(100L -> "zyxwvutsrqponmlkjihg",
      101L -> "zyxwvutsrqponmlkjiXg")
    val df = (hot ++ clean).toDF("id", "s")
    val guarded = Dedup.editDistanceJoin(df, "id", "s", 2, 20, maxJoinPairs = 10L)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // hub semantics: every hot member links to the min id (1), and the
    // exact verify keeps them all (identical strings, distance 0)
    assert((2L to 8L).forall(i => guarded.contains((1L, i))),
      s"hot members lost their hub link: $guarded")
    // all-pairs inside the hot bucket are NOT enumerated
    assert(!guarded.contains((2L, 3L)), s"guard did not engage: $guarded")
    // the clean pair is untouched by the engagement
    assert(guarded.contains((100L, 101L)), s"clean pair lost: $guarded")
    // and with the default cap the same input is exact all-pairs
    val exact = Dedup.editDistanceJoin(df, "id", "s", 2, 20)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.contains((2L, 3L)))
  }

  test("varlen equals the quadratic join on the sf0.001 first-two-words keys") {
    val w = split(col("text"), " ")
    val t = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), concat(element_at(w, 1), lit(" "),
        coalesce(element_at(w, 2), lit(""))).as("key"))
    val blocked = Dedup.editDistanceJoinVarLen(t, "doc_id", "key", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = t.select(col("doc_id").as("a"), col("key").as("pa"))
    val b = t.select(col("doc_id").as("b"), col("key").as("pb"))
    val truth = a.crossJoin(b).filter(col("a") < col("b"))
      .filter(levenshtein(col("pa"), col("pb")) <= 2)
      .select(col("a"), col("b"),
        levenshtein(col("pa"), col("pb")).cast("bigint").as("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(blocked == truth,
      s"varlen missed ${truth -- blocked}, extra ${blocked -- truth}")
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

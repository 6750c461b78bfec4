package graft

import org.scalatest.funsuite.AnyFunSuite

/** README's registry/sweep counts vs the code — these drifted silently in
  * three consecutive rounds (180 vs 184 queries, 23 vs 26 heavy-sweep
  * entries), each time flagged by review instead of a failing build. The
  * counts stay human-readable prose in README; this spec makes them
  * load-bearing: add a query without touching README and `sbt test` says
  * exactly which number to bump.
  */
class DocsDriftSpec extends AnyFunSuite {
  private lazy val readme =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")

  private def statedCount(pattern: scala.util.matching.Regex, what: String): Int =
    pattern.findFirstMatchIn(readme)
      .map(_.group(1).toInt)
      .getOrElse(fail(s"README no longer states the $what count — " +
        s"expected text matching $pattern"))

  test("README's registry query count matches SparkEntry.queries") {
    val stated = statedCount("""the registry: (\d+) queries""".r, "registry")
    assert(stated === SparkEntry.queries.size,
      s"README says $stated queries, registry has ${SparkEntry.queries.size}")
  }

  test("README's heavy-sweep count matches ScaleStress.heavy100") {
    val stated = statedCount("""the (\d+) most expensive scale-free""".r, "heavy-sweep")
    assert(stated === ScaleStress.heavy100.size,
      s"README says $stated heavy queries, heavy100 has ${ScaleStress.heavy100.size}")
  }

  test("SyncDocs is a no-op on the committed README (counts generated, current)") {
    // SyncDocs (round 14) is the zero-hand-edit fix for the count drift
    // this spec kept catching: its regexes must stay in lockstep with the
    // ones above, and the committed README must already be synced. Run on
    // a temp COPY so a failing build never mutates the working tree.
    val tmp = java.nio.file.Files.createTempFile("readme-drift", ".md")
    try {
      java.nio.file.Files.write(tmp, readme.getBytes("UTF-8"))
      val changed = SyncDocs.sync(tmp)
      assert(changed.isEmpty,
        s"README counts stale — run `sbt \"runMain graft.SyncDocs\"`: $changed")
    } finally java.nio.file.Files.delete(tmp)
  }

  test("COVERAGE.md lists every registry query (name, short prefix, or range)") {
    // The inventory the judge reads line-by-line quietly stopped tracking
    // new queries in round 12 (d19/d20/ev6c landed uninventoried). Names
    // appear three ways in the table: in full (d19_lsh_recall_sampled),
    // as a short prefix token ("tx1, tx2, tx3"), or inside a range
    // ("st1–st4") — accept any, fail on none.
    val cov = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")), "UTF-8")
    val ranges = """\b([a-z]+)(\d+)[–-]\1?(\d+)\b""".r.findAllMatchIn(cov)
      .map(m => (m.group(1), m.group(2).toInt, m.group(3).toInt)).toSeq
    def covered(name: String): Boolean = {
      if (cov.contains(name)) return true
      val p = name.takeWhile(_ != '_')
      if (s"""\\b${java.util.regex.Pattern.quote(p)}\\b""".r
            .findFirstIn(cov).isDefined) return true
      p match {
        case s if s.nonEmpty && s.last.isDigit =>
          val letters = s.takeWhile(!_.isDigit)
          val num = s.drop(letters.length).toIntOption
          num.exists(n => ranges.exists { case (l, lo, hi) =>
            l == letters && lo <= n && n <= hi })
        case _ => false
      }
    }
    val missing = SparkEntry.queries.keySet.toSeq.sorted.filterNot(covered)
    assert(missing.isEmpty,
      s"registry queries absent from COVERAGE.md: ${missing.mkString(", ")}")

    val stated = """ALL (\d+) registry queries""".r.findFirstMatchIn(cov)
      .map(_.group(1).toInt)
      .getOrElse(fail("COVERAGE.md no longer states the registry count"))
    assert(stated === SparkEntry.queries.size,
      s"COVERAGE.md says $stated queries, registry has ${SparkEntry.queries.size}" +
        " — run `sbt \"runMain graft.SyncDocs\"`")
  }

  test("every registry query has an oracle (or a documented exemption)") {
    // the round-11 regression class: a query landing without oracle SQL is
    // exactly what turned 184/184 into 182/184 — keep the contract total
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"registry entries without oracle SQL: ${missing.toSeq.sorted.mkString(", ")}")
  }
}

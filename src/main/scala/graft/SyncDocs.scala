package graft

/** Rewrites README.md's registry/heavy-sweep counts from the code itself.
  *
  * Round 13 shipped a red build because README said "192 queries" while the
  * registry had grown to 195 — the third-plus round of exactly this drift,
  * caught by DocsDriftSpec but only AFTER the snapshot was committed. The
  * spec stays the guard (it fails the build on drift); this main is the
  * zero-hand-edit fix: `sbt "runMain graft.SyncDocs"` replaces the numbers
  * in place using the SAME regexes DocsDriftSpec matches, so "add a query"
  * is one code change plus one mechanical command, never a prose hunt.
  * Exits nonzero if a pattern is missing (README restructured) — silently
  * writing nothing would re-open the drift hole.
  */
object SyncDocs {
  /** (pattern to locate the count, replacement count) — keep in lockstep
    * with DocsDriftSpec's statedCount patterns.
    */
  def rewrites: Seq[(scala.util.matching.Regex, Int, String)] = Seq(
    ("""(the registry: )(\d+)( queries)""".r, SparkEntry.queries.size, "registry"),
    ("""(the )(\d+)( most expensive scale-free)""".r, ScaleStress.heavy100.size, "heavy-sweep"))

  /** COVERAGE.md's count uses different prose; same mechanism. */
  def coverageRewrites: Seq[(scala.util.matching.Regex, Int, String)] = Seq(
    ("""(ALL )(\d+)( registry queries)""".r, SparkEntry.queries.size, "coverage-registry"))

  def sync(path: java.nio.file.Path,
      rules: Seq[(scala.util.matching.Regex, Int, String)]): Seq[String] = {
    val before = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    val (after, changed) = rules.foldLeft((before, List.empty[String])) {
      case ((txt, log), (pat, n, what)) =>
        pat.findFirstMatchIn(txt) match {
          case None => sys.error(s"SyncDocs: ${path.getFileName} no longer " +
            s"contains the $what count pattern $pat — fix the prose or the pattern")
          case Some(m) if m.group(2).toInt == n => (txt, log)
          case Some(m) =>
            (pat.replaceFirstIn(txt,
               java.util.regex.Matcher.quoteReplacement(s"${m.group(1)}$n${m.group(3)}")),
             log :+ s"$what: ${m.group(2)} -> $n")
        }
    }
    if (changed.nonEmpty)
      java.nio.file.Files.write(path, after.getBytes("UTF-8"))
    changed
  }

  def sync(readmePath: java.nio.file.Path): Seq[String] =
    sync(readmePath, rewrites)

  def main(args: Array[String]): Unit = {
    val changed = sync(java.nio.file.Paths.get("README.md"), rewrites) ++
      sync(java.nio.file.Paths.get("COVERAGE.md"), coverageRewrites)
    if (changed.isEmpty) println("SyncDocs: doc counts already current")
    else changed.foreach(c => println(s"SyncDocs: $c"))
  }
}

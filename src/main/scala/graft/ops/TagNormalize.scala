package graft.ops

import java.text.Normalizer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** E1 — tag normalization (SURVEY.md §2.9).
  *
  * The reference shells out to a Rust binary over a stdin/stdout pipe
  * (reference: src/normalize_tags.mjs:3-20, invoked src/index.mjs:35-39); the
  * algorithm lives in an un-checked-out submodule, so the observable contract
  * is only "deterministic line -> line string function". We define a
  * documented normalization and pin it with property tests
  * (SURVEY.md §7.5 risk 2):
  *
  *   1. Unicode NFKC fold (compatibility normalize, e.g. ﬁ -> fi)
  *   2. lowercase
  *   3. trim
  *   4. collapse runs of whitespace to a single space
  *
  * Implemented as a plain Scala function (injectable `String => String`) and
  * exposed as a registered UDF so it is usable from SQL. A UDF (not a Catalyst
  * Expression) is deliberate: the function is called once per *distinct* tag
  * via the dictionary build (A4), not once per row, so codegen would buy
  * nothing (SURVEY.md §7.4).
  */
object TagNormalize {

  /** The injectable normalization function. Total: never returns null. */
  val normalize: String => String = { s =>
    if (s == null) ""
    else {
      val folded = Normalizer.normalize(s, Normalizer.Form.NFKC)
      folded.toLowerCase.trim.replaceAll("\\s+", " ")
    }
  }

  private val normalizeUdf = udf(normalize)

  /** Column form. */
  def normalizeTag(c: Column): Column = normalizeUdf(c)

  /** SQL registration: `SELECT normalize_tag(name) FROM ...`. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("normalize_tag", normalize)

  /** E1 route (2) — the reference's actual mechanism: pipe the tag stream
    * through an EXTERNAL command, one tag per stdin line, one normalized tag
    * per stdout line, results zipped back POSITIONALLY
    * (reference src/normalize_tags.mjs:8: `tags[i] -> lines[i]`).
    *
    * `RDD.pipe` is the distributed form of that contract: each partition
    * forks the command once, streams its rows as lines, and reads back lines
    * in order — so `zip` (same partitioning, same per-partition counts,
    * REQUIRES the command to emit exactly one line per input line) restores
    * the pairing without any join key, exactly like the reference's
    * index-zip. One process per partition, not per row: at 1000 executors
    * that is 1000 long-lived subprocesses, each saturated by its partition.
    *
    * Tags must be newline-free (the reference has the same constraint — a
    * newline inside a tag would desync its zip too).
    *
    * @return (tag, normalized) pairs, one per input row.
    */
  def normalizeViaPipe(
      spark: SparkSession, tags: org.apache.spark.sql.DataFrame,
      command: Seq[String]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val in = tags.select("tag").as[String].rdd
    in.zip(in.pipe(command)).toDF("tag", "normalized")
  }
}

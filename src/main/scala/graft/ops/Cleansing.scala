package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar cleansing / per-row transform operators (SURVEY.md §2.3, §2.4).
  *
  * Each is a pure `Column => Column` (or `Column`s => `Column`) expression so
  * Catalyst can fold, push down, and whole-stage-codegen them — the reference
  * ran these one JS object at a time on the driver
  * (reference: src/index.mjs:23-26, src/column_sets.mjs:5-17).
  */
object Cleansing {

  /** T1 — constant overwrite (password masking, reference src/index.mjs:24). */
  def constMask(placeholder: String): Column = lit(placeholder)

  /** T2 — JSON-encoded string array -> ArrayType(String)
    * (reference src/index.mjs:25: `JSON.parse(categories)`).
    */
  def jsonStringArray(c: Column): Column =
    from_json(c, org.apache.spark.sql.types.DataType.fromDDL("array<string>"))

  /** T3 — invalid-timestamp sentinel fallback
    * (reference src/column_sets.mjs:5-17): null stays null; an unparseable
    * value (MariaDB zero-date like '0000-00-00 00:00:00') becomes the sink
    * default; a parseable value passes through. `DEFAULT` is a sink-side
    * concept, so the engine representation is an injectable default timestamp
    * (SURVEY.md §7.5 risk 3).
    */
  def sentinelTimestamp(raw: Column, default: Column): Column = {
    val parsed = try_to_timestamp(raw)
    when(raw.isNull, lit(null).cast("timestamp"))
      .when(parsed.isNull, default.cast("timestamp"))
      .otherwise(parsed)
  }

  /** T5 — falsy (0 or null) -> null; MySQL used 0 for "not a reply"
    * (reference src/column_sets.mjs:67-70).
    */
  def falsyToNull(c: Column): Column =
    when(c.isNull || c === 0, lit(null)).otherwise(c)

  /** T6 — truncate to fit varchar(n) (reference src/index.mjs:51-52). */
  def truncate(c: Column, n: Int): Column = substring(c, 1, n)

  /** T9 — coalesce across differently-named source columns
    * (reference src/index.mjs:104-108: uploads carry `id`, favorites carry
    * `video_id`).
    */
  def coalesceId(a: Column, b: Column): Column = coalesce(a, b)

  /** F2 — reply-marker depth: length of the leading caret run
    * (reference src/index.mjs:62, regex /^\^+/).
    */
  def caretDepth(content: Column): Column =
    length(regexp_extract(content, "^\\^+", 0))
}

package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines (builder-prompt north star;
  * no reference analog — the reference's only string ops are split/regex,
  * SURVEY.md §2.4). All pure Column expressions: codegen-friendly, no UDFs in
  * the hot path, shuffle-free (per-row), so they scale linearly with input
  * splits at 100 TB.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    size(tokens(text)).cast("bigint")

  /** BPE-ish token count: letter runs, digit runs, single punctuation. */
  val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(bpePattern), lit(0))).cast("bigint")

  /** English stopword hits (tiny fixed list, shared with the oracle SQL). */
  val stopEn = "\\b(the|a|of|and|to|in|is)\\b"
  def stopwordHits(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(stopEn), lit(0))).cast("bigint")

  /** Quality score in [0,1]: stopword density (caps at 1/5 token share) and
    * length credit (caps at 200 tokens), equally weighted. Deterministic
    * double arithmetic — element-wise, so bit-identical across engines.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCountWs(text).cast("double")
    val stopRatio = stopwordHits(text).cast("double") / nTok
    least(stopRatio * 5.0, lit(1.0)) * 0.5 + least(nTok / 200.0, lit(1.0)) * 0.5
  }

  /** Language-ID marker sets (n-gram/stopword heuristic). Order = tie-break
    * priority.
    */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|of|and|to|in|is)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht)\\b",
    "es" -> "\\b(el|los|las|es|una)\\b",
    "fr" -> "\\b(le|la|les|et|est|une)\\b",
    "zh" -> "(的|是|了|在|我)")

  /** Predicted language: argmax of marker hits with fixed priority order. */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, p) =>
      l -> size(regexp_extract_all(lower(text), lit(p), lit(0))).cast("bigint")
    }
    // en wins ties vs all; de vs the rest; ... last one is the fallback.
    scores.init.zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((l, s), i), elseCol) =>
        val rest = scores.drop(i + 1).map(_._2)
        when(rest.foldLeft(lit(true))((acc, r) => acc && s >= r), lit(l))
          .otherwise(elseCol)
    }
  }

  /** Bag-of-words fingerprint: md5 of the sorted distinct token list — a
    * canonical-form document hash for near-exact dedup (token-order
    * insensitive).
    */
  def fingerprintBow(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(lower(text)))), " ").cast("binary"))

  /** Mean word length: non-space chars over whitespace tokens. */
  def meanWordLen(text: Column): Column =
    length(regexp_replace(text, "\\s", "")).cast("double") /
      tokenCountWs(text).cast("double")

  /** Symbol-to-char ratio: fraction of chars that are neither alphanumeric
    * nor whitespace (Gopher-rule C4-style gibberish signal).
    */
  def symbolRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", "")))
      .cast("double") / length(text).cast("double")

  /** PII scrubbing: emails then URLs replaced with typed placeholder tokens
    * — the redaction pass a training-data pipeline runs before anything
    * else sees the text. Spark's regexp_replace is global by default
    * (DuckDB needs the explicit 'g' flag).
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlPattern = "https?://[^\\s]+"
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, emailPattern, "<EMAIL>"),
      urlPattern, "<URL>")

  /** One BPE merge step: leftmost non-overlapping replacement of the
    * space-delimited symbol `pair` inside a space-prefixed,
    * space-separated symbol sequence (" a b c " merging "a b" -> " ab c ").
    * The pair is a DATA value interpolated into a regex, so it is quoted on
    * both the pattern side (Pattern.quote) and the replacement side
    * (Matcher.quoteReplacement). For bpe1/bpe2's corpus the quoting is
    * currently REDUNDANT — training words are pre-filtered to `^[a-z]+$`,
    * so no symbol can contain a regex metacharacter, and the DuckDB oracle
    * replays the same replacement unquoted under that invariant — but the
    * quoting makes the invariant local to this helper instead of a
    * distant filter (property-pinned in PropertySpec with metachar
    * symbols that would break the unquoted form).
    */
  def mergePairPattern(pair: String): String =
    java.util.regex.Pattern.quote(" " + pair + " ")
  def mergePairReplacement(pair: String): String =
    java.util.regex.Matcher.quoteReplacement(" " + pair.replace(" ", "") + " ")
  def mergePair(seq: Column, pair: String): Column =
    regexp_replace(seq, mergePairPattern(pair), mergePairReplacement(pair))

  /** Pure-JVM face of [[mergePair]] — Spark's regexp_replace IS
    * java.util.regex, so this is the same computation (property-pinned).
    */
  def mergePairStr(seq: String, pair: String): String =
    seq.replaceAll(mergePairPattern(pair), mergePairReplacement(pair))
}

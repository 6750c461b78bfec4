package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.ops.{CommentLinks, TagNormalize}

/** Property-based suites (scalacheck's sbt integration; SURVEY §5 item 3).
  * Pure-function properties run without a SparkSession — the distributed
  * faces of these operators are covered by the oracle gate and SparkSpec
  * suites.
  */
object TagNormalizeProps extends Properties("normalizeTag") {
  private val f = TagNormalize.normalize
  private val gen = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '\t', '\n', 'ﬁ', 'Å', '大')))
      .map(_.mkString))

  property("idempotent") = forAll(gen) { s => f(f(s)) == f(s) }
  property("deterministic") = forAll(gen) { s => f(s) == f(s) }
  property("no leading/trailing whitespace") = forAll(gen) { s =>
    val r = f(s); r == r.trim
  }
  property("no double spaces") = forAll(gen) { s => !f(s).contains("  ") }
  property("no uppercase letters survive") = forAll(gen) { s =>
    f(s).forall(c => !c.isLetter || !c.isUpper)
  }
  property("null-safe") = Prop(f(null) == "")
}

object CommentLinkProps extends Properties("commentLinks") {
  private def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)

  private val groupGen: Gen[Array[CommentLinks.CommentRow]] = for {
    n <- Gen.choose(0, 40)
    carets <- Gen.listOfN(n, Gen.choose(0, 5))
    dels <- Gen.listOfN(n, Gen.option(Gen.choose(-3, 3)))
  } yield carets.zip(dels).zipWithIndex.map { case ((k, d), i) =>
    CommentLinks.CommentRow(
      id = i.toLong, video_id = 1L, content = "^" * k + "x",
      created_at = ts(i), deleted_at = d.map(off => ts(i + off)))
  }.toArray

  private def byId(rows: Array[CommentLinks.CommentRow]) =
    rows.map(r => r.id -> r).toMap

  property("links point backwards to same-video visible comments") =
    forAll(groupGen) { rows =>
      val m = byId(rows)
      CommentLinks.linkGroup(rows).forall { l =>
        l.response_to.forall { r =>
          val target = m(r)
          val self = m(l.id)
          r < l.id && !target.deleted_at.exists(_.before(self.created_at))
        }
      }
    }

  property("non-replies never link; output preserves cardinality") =
    forAll(groupGen) { rows =>
      val m = byId(rows)
      val out = CommentLinks.linkGroup(rows).toList
      out.size == rows.length &&
        out.filter(l => CommentLinks.caretCount(m(l.id).content) == 0)
          .forall(_.response_to.isEmpty)
    }

  // the bounded-history streaming replay must be INDISTINGUISHABLE from the
  // monolithic scan on any group, including at the tightest legal bound
  // (generator carets max out at 5) where truncation actually fires
  property("streaming replay equals monolithic replay at the tightest bound") =
    forAll(groupGen) { rows =>
      CommentLinks.linkGroupStreaming(rows, maxCaretDepth = 5).toList ==
        CommentLinks.linkGroup(rows).toList
    }
}

/** The BPE merge step interpolates a DATA value (the argmax pair) into a
  * regex — quoting (Pattern.quote / Matcher.quoteReplacement) is what keeps
  * that safe for ANY symbol alphabet. These properties feed symbols that
  * WOULD break the unquoted form (".", "+", "$1", "\\") through the merge
  * and pin it to a literal left-to-right scan reference. bpe1/bpe2's
  * corpora are `^[a-z]+$`-filtered so the quoting is redundant THERE (the
  * DuckDB oracle replays unquoted under that invariant); here is where the
  * general contract lives.
  */
object BpeMergeProps extends Properties("bpeMergePair") {
  import graft.text.TextAnalysis

  private val symGen = Gen.oneOf("a", "b", "ab", ".", "+", "$1", "\\", "x*", "(")
  private val seqGen: Gen[List[String]] = Gen.listOf(symGen)

  /** Literal leftmost non-overlapping replacement of " a b " with " ab " —
    * the pinned merge semantics (the match consumes its trailing space, so
    * an immediately adjacent second occurrence does not merge in the same
    * pass, exactly like the quoted replaceAll and the oracle's RE2 'g').
    */
  private def reference(seq: String, pair: String): String = {
    val target = " " + pair + " "
    val repl = " " + pair.replace(" ", "") + " "
    val sb = new StringBuilder
    var i = 0
    while (i < seq.length) {
      if (seq.startsWith(target, i)) { sb.append(repl); i += target.length }
      else { sb.append(seq.charAt(i)); i += 1 }
    }
    sb.toString
  }

  property("quoted merge equals the literal-scan reference on metachar symbols") =
    forAll(seqGen, symGen, symGen) { (syms, p1, p2) =>
      val seq = syms.mkString(" ", " ", " ")
      val pair = p1 + " " + p2
      TextAnalysis.mergePairStr(seq, pair) == reference(seq, pair)
    }

  property("unquoted regex misbehaves on the same alphabet (why quoting exists)") = {
    // pair ". ." as a raw regex matches ANY two single chars: " a b " would
    // merge to " .. " — the quoted form correctly leaves it untouched
    val seq = " a b "
    val unquoted = seq.replaceAll(" . . ", " .. ")
    Prop(TextAnalysis.mergePairStr(seq, ". .") == seq && unquoted == " .. ")
  }

  property("merge is a no-op when the pair is absent") =
    forAll(seqGen) { syms =>
      val seq = syms.mkString(" ", " ", " ")
      // "q z" never occurs: q/z are outside the symbol alphabet
      TextAnalysis.mergePairStr(seq, "q z") == seq
    }
}

/** The a5 GroupConcatDistinct buffer is a hand-merged sorted-distinct Seq —
  * merge-order invariance is exactly where a buffer/encoder bug would bite,
  * so it gets algebraic properties: any partitioning of the inputs, reduced
  * partition-wise then merged in any grouping order, must equal the direct
  * sorted-distinct join.
  */
object GroupConcatProps extends Properties("groupConcatDistinct") {
  import graft.functions.Aggregators.GroupConcatDistinct

  private val agg = new GroupConcatDistinct(",", 100)

  private def viaAgg(parts: List[List[String]]): String = {
    val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
    agg.finish(partials.foldLeft(agg.zero)(agg.merge))
  }

  private def reference(xs: List[String]): String = {
    val full = xs.filter(_ != null).distinct.sorted.mkString(",")
    if (full.length <= 100) full else full.substring(0, 100)
  }

  private val inputGen: Gen[List[List[String]]] =
    Gen.listOf(Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)), Gen.const(null: String))))

  property("partition-wise reduce+merge equals direct sorted distinct") =
    forAll(inputGen) { parts => viaAgg(parts) == reference(parts.flatten) }

  property("merge order irrelevant") = forAll(inputGen) { parts =>
    val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
    val fwd = partials.foldLeft(agg.zero)(agg.merge)
    val rev = partials.reverse.foldLeft(agg.zero)(agg.merge)
    agg.finish(fwd) == agg.finish(rev)
  }

  // The round-3 buffer appends between compactions (the old "always sorted
  // distinct" invariant moved to compaction time), so the buffer-level
  // properties are now: finish canonicalizes ANY buffer state, and the
  // smallest-(maxLen+2) cap loses nothing even when it binds hard.
  property("tiny maxLen: cap binds, output still matches brute force") =
    forAll(Gen.choose(0, 12), Gen.oneOf("", ",", ",,,"),
      Gen.listOf(Gen.oneOf(Gen.const(""), Gen.const(null: String),
        Gen.alphaLowerStr.map(_.take(3))))) { (maxLen, sep, xs) =>
      val a = new GroupConcatDistinct(sep, maxLen)
      val got = a.finish(xs.foldLeft(a.zero)(a.reduce))
      val full = xs.filter(_ != null).distinct.sorted.mkString(sep)
      got == (if (full.length <= maxLen) full else full.substring(0, maxLen))
    }

  property("compaction path: buffers stay bounded over adversarial volume") = {
    // enough rows to force several compactions of a small-maxLen aggregator;
    // high-cardinality values so the pre-round-3 sorted-insert would be the
    // O(n^2) case, and the cap (maxLen+2 smallest) must still be lossless
    val a = new GroupConcatDistinct(",", 10)
    val xs = (0 until 5000).map(i => f"v${(i * 7919) % 4000}%04d").toList
    val partials = xs.grouped(1700).map(_.foldLeft(a.zero)(a.reduce)).toList
    val buf = partials.foldLeft(a.zero)(a.merge)
    val full = xs.distinct.sorted.mkString(",")
    Prop(partials.forall(_.length <= 2 * 12 + 1024) &&
      a.finish(buf) == full.substring(0, 10))
  }
}

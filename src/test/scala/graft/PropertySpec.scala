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

  property("buffer stays sorted and distinct") = forAll(inputGen) { parts =>
    val b = parts.flatten.foldLeft(agg.zero)(agg.reduce)
    b == b.distinct.sorted
  }
}

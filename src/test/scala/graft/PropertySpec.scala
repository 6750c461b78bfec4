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

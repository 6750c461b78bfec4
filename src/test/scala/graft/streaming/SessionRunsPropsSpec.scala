package graft.streaming

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.streaming.EventStreams.{sessionRuns, splitSessions, SessEv}

/** Pure-function properties of the ev6/ev6b sessionization core — the
  * single-pass [[EventStreams.sessionRuns]] must agree with the declarative
  * [[EventStreams.splitSessions]] on arbitrary multi-user inputs, with the
  * gap shrunk to 100µs so generated timestamps hit the exact-boundary case
  * constantly (the fixture-scale oracle can't force that density).
  */
object SessionRunsProps extends Properties("sessionRuns") {

  private val gapUs = 100L

  // 1-3 users, each 0-40 events whose increments cluster around the gap
  // boundary (0, gap-1, gap, gap+1 all frequent); same-ts ties get distinct
  // event_ids so the (ts, event_id) order stays total
  private val eventsGen: Gen[Vector[SessEv]] = for {
    nUsers <- Gen.choose(1, 3)
    perUser <- Gen.listOfN(nUsers, for {
      n <- Gen.choose(0, 40)
      incs <- Gen.listOfN(n, Gen.frequency(
        3 -> Gen.const(0L), 3 -> Gen.const(gapUs - 1), 5 -> Gen.const(gapUs),
        5 -> Gen.const(gapUs + 1), 4 -> Gen.choose(1L, 3 * gapUs)))
      types <- Gen.listOfN(n, Gen.oneOf("view", "click", "purchase"))
    } yield (incs, types))
  } yield perUser.zipWithIndex.flatMap { case ((incs, types), u) =>
    incs.scanLeft(0L)(_ + _).tail.lazyZip(types).lazyZip(incs.indices).map {
      case (ts, typ, i) => SessEv(u.toLong + 1L, ts, i.toLong, typ)
    }
  }.toVector

  private def sorted(evs: Vector[SessEv]): Vector[SessEv] =
    evs.sortBy(e => (e.user_id, e.ts_us, e.event_id))

  private def viaSplit(evs: Vector[SessEv]) =
    evs.groupBy(_.user_id).toVector.sortBy(_._1).flatMap { case (uid, g) =>
      splitSessions(g.sortBy(e => (e.ts_us, e.event_id)), gapUs)
        .zipWithIndex.map { case (s, i) =>
          (uid, i.toLong + 1L, s.length.toLong,
            s.map(_.event_type).mkString(" "), s.last.event_type)
        }
    }

  property("single pass equals per-user splitSessions (incl. exact-boundary gaps)") =
    forAll(eventsGen) { evs =>
      val got = sessionRuns(sorted(evs).iterator, gapUs).toVector
        .map(r => (r.user_id, r.sess_idx, r.n_events, r.seq, r.label))
      got == viaSplit(evs)
    }

  property("no event lost or reordered: per-user seq concat = ordered type list") =
    forAll(eventsGen) { evs =>
      val got = sessionRuns(sorted(evs).iterator, gapUs).toVector
      evs.map(_.user_id).distinct.forall { uid =>
        val expect = sorted(evs).filter(_.user_id == uid).map(_.event_type)
        val joined = got.filter(_.user_id == uid).sortBy(_.sess_idx)
          .flatMap(r => r.seq.split(" ").toVector.filter(_.nonEmpty))
        joined == expect
      }
    }

  property("session boundaries: split iff gap STRICTLY exceeds the bound") =
    forAll(eventsGen) { evs =>
      splitSessions(evs.filter(_.user_id == 1L).sortBy(e => (e.ts_us, e.event_id)), gapUs)
        .forall { s =>
          s.nonEmpty && s.sliding(2).forall {
            case Seq(a, b) => b.ts_us - a.ts_us <= gapUs
            case _ => true
          }
        }
    }

  property("sess_idx is 1..k dense per user; label is the last token") =
    forAll(eventsGen) { evs =>
      val got = sessionRuns(sorted(evs).iterator, gapUs).toVector
      got.groupBy(_.user_id).forall { case (_, rows) =>
        rows.map(_.sess_idx).sorted == (1L to rows.length.toLong).toVector
      } && got.forall(r => r.seq.split(" ").last == r.label)
    }

  // ---- ev6c's split-at-N cap ----------------------------------------------

  private val capGen = Gen.choose(1, 5)

  private def viaSplitCapped(evs: Vector[SessEv], cap: Int) =
    evs.groupBy(_.user_id).toVector.sortBy(_._1).flatMap { case (uid, g) =>
      splitSessions(g.sortBy(e => (e.ts_us, e.event_id)), gapUs, cap)
        .zipWithIndex.map { case (s, i) =>
          (uid, i.toLong + 1L, s.length.toLong,
            s.map(_.event_type).mkString(" "), s.last.event_type)
        }
    }

  property("capped single pass equals per-user capped splitSessions") =
    forAll(eventsGen, capGen) { (evs, cap) =>
      val got = sessionRuns(sorted(evs).iterator, gapUs, cap).toVector
        .map(r => (r.user_id, r.sess_idx, r.n_events, r.seq, r.label))
      got == viaSplitCapped(evs, cap)
    }

  // THE cap-boundary law, and exactly what the ev6c oracle's
  // (row_number - 1) // cap chunking assumes: gap boundaries are unchanged
  // by the cap (the gap rule compares consecutive-event timestamps only),
  // and within each gap session the cap splits at every cap-th event —
  // so the capped split IS the uncapped split with each session regrouped
  // into grouped(cap) chunks (all full except possibly the last).
  property("capped split = uncapped split regrouped into grouped(cap) chunks") =
    forAll(eventsGen, capGen) { (evs, cap) =>
      val one = evs.filter(_.user_id == 1L).sortBy(e => (e.ts_us, e.event_id))
      val uncapped = splitSessions(one, gapUs)
      splitSessions(one, gapUs, cap) ==
        uncapped.flatMap(_.grouped(cap).map(_.toVector))
    }

  property("cap = Int.MaxValue is exactly the uncapped semantics") =
    forAll(eventsGen) { evs =>
      sessionRuns(sorted(evs).iterator, gapUs, Int.MaxValue).toVector ==
        sessionRuns(sorted(evs).iterator, gapUs).toVector
    }

  property("no capped session exceeds cap; short sessions are gap- or run-terminal") =
    forAll(eventsGen, capGen) { (evs, cap) =>
      val one = evs.filter(_.user_id == 1L).sortBy(e => (e.ts_us, e.event_id))
      val ss = splitSessions(one, gapUs, cap)
      ss.forall(_.length <= cap) && ss.zipWithIndex.forall { case (s, i) =>
        s.length == cap || i == ss.length - 1 ||
          ss(i + 1).head.ts_us - s.last.ts_us > gapUs
      }
    }
}

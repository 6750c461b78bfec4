package graft

import org.apache.spark.sql.functions._

import graft.text.Retrieval

/** The BM25 query-table operator against hand-computed scores — the
  * registry face (tx18) hash-checks it against DuckDB on the fixture; this
  * spec pins the FORMULA and the contract edges on a corpus small enough
  * to compute by hand.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // corpus: 3 docs; "spark" in 2 of them, "flink" in 1
  private def docs = Seq(
    (1L, "spark spark join"),   // dl 3
    (2L, "spark filter"),       // dl 2
    (3L, "flink stream stream") // dl 3
  ).toDF("doc_id", "text")

  // mirrors the operator's arithmetic exactly: per-term integer-scaled
  // contributions (x 1e9) sum as longs, ONE final round to 6 decimals
  private def bm25e9(tf: Long, df: Long, dl: Long, nDocs: Long, sumDl: Long,
      k1: Double = 1.2, b: Double = 0.75): Long = {
    val idf = math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
    math.rint(idf * ((tf * (k1 + 1.0)) /
      (tf + k1 * ((1 - b) + b * (dl / (sumDl.toDouble / nDocs))))) * 1e9).toLong
  }
  private def score(e9s: Long*): Double =
    math.rint(e9s.sum / 1e9 * 1e6) / 1e6

  test("scores match the hand-computed Okapi formula; ranking and tie-break hold") {
    val q = Seq((1L, "spark"), (2L, "flink"), (2L, "stream")).toDF("query_id", "term")
    val got = Retrieval.bm25TopK(docs, q).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    // n_docs=3, sum_dl=8; df(spark)=2, df(flink)=1, df(stream)=1
    val q1 = got.filter(_._1 == 1L)
    assert(q1.map(t => (t._2, t._3)).toSeq === Seq((1L, 1L), (2L, 2L)),
      "doc 1 (tf=2, longer) outranks doc 2 (tf=1, shorter) for 'spark'; doc 3 absent")
    assert(q1.find(_._3 == 1L).get._4 === score(bm25e9(tf = 2, df = 2, dl = 3, 3, 8)))
    assert(q1.find(_._3 == 2L).get._4 === score(bm25e9(tf = 1, df = 2, dl = 2, 3, 8)))

    // query 2: both terms live only in doc 3 — contributions SUM
    val q2 = got.filter(_._1 == 2L)
    assert(q2.map(_._3).toSeq === Seq(3L))
    assert(q2.head._4 ===
      score(bm25e9(1, 1, 3, 3, 8), bm25e9(2, 1, 3, 3, 8)),
      "per-term contributions add (exact integer-scaled sum)")
  }

  test("k bounds the output; equal scores tie-break by doc_id ascending") {
    val twins = Seq(
      (10L, "alpha beta"), (11L, "alpha beta"), (12L, "alpha beta"),
      (13L, "gamma")).toDF("doc_id", "text")
    val q = Seq((7L, "alpha")).toDF("query_id", "term")
    val got = Retrieval.bm25TopK(twins, q, k = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    // three identical-score docs, k=2: lowest two doc_ids, ranks 1..2
    assert(got.toSeq === Seq((1L, 10L), (2L, 11L)))
  }

  test("matches an independent pure-Scala BM25 on a seeded random corpus") {
    // the registry oracle pins the operator against DuckDB on the fixture;
    // this pins it against a SECOND independent implementation on a corpus
    // with controlled properties (repeats, multi-term overlaps, absent
    // terms), exact to the integer-scaled contract
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
      "zeta", "eta", "theta", "iota", "kappa")
    val corpus = (1L to 30L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val qterms = Seq((1L, "alpha"), (1L, "beta"), (2L, "gamma"),
      (2L, "absent"), (3L, "eps"), (3L, "zeta"), (3L, "eta"))
    val k = 4

    // independent reference
    val toks = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
    val dl = toks.view.mapValues(_.size.toLong).toMap
    val nDocs = corpus.size.toLong
    val sumDl = dl.values.sum
    val tf: Map[(Long, String), Long] = toks.toSeq.flatMap { case (id, ws) =>
      ws.groupBy(identity).map { case (w, g) => (id, w) -> g.size.toLong }
    }.toMap
    val termSet = qterms.map(_._2).distinct
    val df = termSet.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
    val expected = qterms.groupBy(_._1).toSeq.flatMap { case (qid, ts2) =>
      val scores = toks.keys.toSeq.flatMap { id =>
        val e9 = ts2.map(_._2).filter(t => tf.contains((id, t))).map { t =>
          bm25e9(tf((id, t)), df(t), dl(id), nDocs, sumDl)
        }
        if (e9.isEmpty) None else Some(id -> e9.sum)
      }
      scores.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex.map {
        case ((id, s), i) => (qid, (i + 1).toLong, id, score(s))
      }
    }.toSet

    val got = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"),
        qterms.toDF("query_id", "term"), k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got === expected)
  }

  test("docs with no query term never appear; unmatched terms contribute nothing") {
    val q = Seq((9L, "absentterm"), (9L, "filter")).toDF("query_id", "term")
    val got = Retrieval.bm25TopK(docs, q).collect()
    assert(got.map(_.getLong(2)).toSet === Set(2L),
      "only doc 2 contains 'filter'; 'absentterm' must not invent rows")
  }
}

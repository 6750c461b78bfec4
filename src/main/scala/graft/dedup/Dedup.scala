package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Checkpoints.TrackedOps

/** Deduplication operators for LLM-data pipelines (builder-prompt north
  * star). Four families: exact (hash-groupBy), MinHash+LSH, SimHash, and
  * n-gram Jaccard. Embedding-cosine near-dup lives with the vector ops.
  *
  * Hash choice: every hash is derived from md5 hex strings — deliberately
  * engine-portable (the DuckDB oracle computes the identical signature), and
  * seeded per hash-function by prefixing the index. All expressions are
  * Catalyst built-ins (codegen'd higher-order functions), no UDFs.
  *
  * Scale posture: exact dedup is one hash-shuffle; MinHash signatures are
  * per-row (shuffle-free); LSH candidate generation shuffles (band, value)
  * pairs — rows ≈ docs × bands, joined on band buckets so the cross-join
  * never materializes (the whole point of LSH at 100 TB); verification
  * (true Jaccard) touches only candidates.
  */
object Dedup {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Bucket-size ceiling for the candidate generators' in-bucket pair
    * expansion. A real crawl has pathological band buckets (empty docs,
    * template boilerplate): one million-doc band key means a ~10^12-row
    * expansion AND a single aggregation buffer holding the whole bucket.
    * Buckets above the cap switch to the star expansion (see
    * [[candidatePairs]]); the fixtures' buckets run tens of docs, so the
    * default never engages below a genuinely pathological corpus.
    *
    * ORACLE COUPLING (round-10 advice): the registry DuckDB oracles for the
    * guarded generators (d3/d8/d9, v2b, v8, sd1) always replay the UNGUARDED
    * all-pairs expansion — hash equivalence holds exactly while no
    * verify-fixture bucket exceeds this cap. That invariant is surfaced, not
    * assumed: every engagement registers in [[guardEngagements]], and
    * `graft.Verify` drains it at end of run and prints a loud notice naming
    * the engaged generators, so a future over-cap fixture (or a lowered cap)
    * reads as "guard engaged → oracle not comparable", never as a bare hash
    * mismatch.
    */
  val DefaultMaxBucket = 10000

  /** Generator labels whose skew guard engaged in this JVM (see
    * [[DefaultMaxBucket]]'s oracle-coupling note). Drained by Verify.
    */
  private val guardEngagements =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def drainGuardEngagements(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val out = guardEngagements.asScala.toSeq.sorted
    guardEngagements.clear()
    out
  }

  /** Non-draining view, for mid-run persistence: Verify snapshots this into
    * its guard_engagements.json sidecar after every query, so a JVM killed
    * mid-sweep still leaves a machine-readable record of which oracles were
    * non-comparable (round-11 advice — the end-of-run stderr notice alone
    * died with the process).
    */
  def peekGuardEngagements: Seq[String] = {
    import scala.jdk.CollectionConverters._
    guardEngagements.asScala.toSeq.sorted
  }

  /** The skew guard shared by the candidate generators: find bucket keys
    * whose member count exceeds `maxBucket`, loudly (the repo's
    * no-silent-caps rule — an overflow is logged with bucket count, member
    * volume, and the largest bucket, never silently dropped). Returns None
    * when no bucket overflows — the caller keeps its exact all-pairs plan,
    * so the guard cannot change results on non-pathological data.
    *
    * The size pass is a count aggregation — map-side combinable, constant
    * buffer per key — so DETECTING a million-doc bucket never buffers it.
    * The oversized key set is at most |rows|/maxBucket keys (in practice a
    * handful), hence broadcastable by construction.
    */
  // NOTE: the three guarded generators below (candidatePairs,
  // simhashCandidates, candidatePairsWithEstimate) intentionally repeat the
  // small/star two-path expansion with schema-level variation (plain ids vs
  // min_by-carried structs). A change to the star semantics must land in
  // all three — DedupSkewGuardSpec pins each generator's guard separately,
  // so a forked edit fails the suite rather than shipping silently.
  // private[graft]: the vector-side candidate generators (VectorOps /
  // sd1's cell pair join) reuse the same detection pass
  private[graft] def oversizedKeys(bk: DataFrame, keyCols: Seq[String], maxBucket: Int,
      what: String): Option[DataFrame] = {
    val sizes = bk.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucket)
    val st = sizes.agg(count(lit(1)).as("k"), sum(col("__n")).as("m"),
      max(col("__n")).as("big")).collect()(0)
    if (st.getLong(0) == 0L) None
    else {
      log.warn(s"$what skew guard engaged: ${st.getLong(0)} bucket(s) exceed " +
        s"$maxBucket members (largest ${st.getLong(2)}, ${st.getLong(1)} total rows); " +
        "oversized buckets use the linear star expansion instead of all-pairs")
      guardEngagements.add(what)
      Some(sizes.select(keyCols.map(col): _*))
    }
  }

  /** Flag each batch row with whether its key is POSSIBLY in the prior
    * snapshot, via a Bloom filter built over the prior's keys (distributed
    * partial filters OR-merged on the driver, then broadcast once — not
    * re-serialized into every task closure).
    *
    * Contract: no false negatives (a key present in prior always flags
    * true — BloomFilter's guarantee), false positives at ~`fpp`. So the
    * flag is a PREFILTER, never an answer: `false` rows are definitely new
    * and can skip any confirm join entirely; `true` rows still need the
    * exact check. Output correctness therefore never depends on `fpp` —
    * a fp only costs extra confirm-join traffic.
    *
    * 100 TB posture: bits ≈ -n·ln(fpp)/ln²2 — 1e9 prior keys at 1% is
    * ~1.2 GB, broadcast once per executor (NOT per task). Beyond driver/
    * executor memory, shard the filter by key range and map each batch
    * partition against its shard — the flag semantics are unchanged.
    * `expectedItems` comes from a `count()` pass here; a production prior
    * is a standing table whose row count is metadata.
    *
    * Dtype discipline: `stat.bloomFilter` hashes integral keys via
    * `putLong` and strings via their UTF-8 bytes — DISJOINT hash domains.
    * The probe must therefore match the build side's dtype exactly, or
    * every probe reads "definitely new" and [[bloomNewRows]] would
    * re-emit already-seen rows: a silent break of the no-false-negative
    * contract, not a perf bug (Spark would happily insert an implicit
    * bigint→string cast under a mistyped UDF and never warn). Hence the
    * hard requires below; unsupported key dtypes fail loudly instead of
    * probing the wrong domain. The filter broadcast stays alive as long
    * as the returned (lazy) DataFrame's plan does — Spark's
    * ContextCleaner reclaims it once the plan is unreachable, so an
    * explicit destroy here would break late consumers.
    */
  def bloomMaybeSeen(prior: DataFrame, batch: DataFrame, keyCol: String,
      flagCol: String, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types._
    def domain(dt: DataType): String = dt match {
      case StringType => "string"
      case ByteType | ShortType | IntegerType | LongType => "long"
      case other => throw new IllegalArgumentException(
        s"bloomMaybeSeen key '$keyCol' has dtype $other; BloomFilter " +
          "supports string and integral keys only")
    }
    val buildDomain = domain(prior.schema(keyCol).dataType)
    val probeDomain = domain(batch.schema(keyCol).dataType)
    require(buildDomain == probeDomain,
      s"bloomMaybeSeen key '$keyCol': prior hashes as $buildDomain but " +
        s"batch would probe as $probeDomain — disjoint hash domains, every " +
        "probe would read 'definitely new'")
    val expected = math.max(prior.count(), 1L)
    val bf = prior.stat.bloomFilter(col(keyCol), expected, fpp)
    val bfB = prior.sparkSession.sparkContext.broadcast(bf)
    val maybe = buildDomain match {
      case "string" =>
        udf((k: String) => k != null && bfB.value.mightContainString(k))
      case _ =>
        udf((k: java.lang.Long) => k != null && bfB.value.mightContainLong(k))
    }
    batch.withColumn(flagCol, maybe(col(keyCol)))
  }

  /** Incremental exact dedup against a prior snapshot, Bloom-prefiltered:
    * rows whose key the filter has never seen bypass the confirm join
    * (zero shuffle for them — at a typical crawl's ~90% new-rate that is
    * 90% of the batch), and only the maybe-seen sliver anti-joins the
    * prior to rescue Bloom false positives. Result is EXACTLY the plain
    * `batch ANTI JOIN prior` — the bloom changes cost, not semantics
    * (that equivalence is the bf1 oracle and BloomGateSpec's property).
    */
  def bloomNewRows(prior: DataFrame, batch: DataFrame, keyCol: String,
      fpp: Double = 0.01): DataFrame = {
    val flag = "__maybe_seen"
    val flagged = bloomMaybeSeen(prior, batch, keyCol, flag, fpp)
    val definitelyNew = flagged.filter(!col(flag))
    val confirmed = flagged.filter(col(flag))
      .join(prior.select(col(keyCol)), Seq(keyCol), "left_anti")
    definitelyNew.unionByName(confirmed).drop(flag)
  }

  /** Per-key candidate-pair ceiling for the fuzzy joins' segment⋈window
    * equi-joins (ld2/ld3). Unlike [[DefaultMaxBucket]] (member count of one
    * bucket), the explosive quantity in a two-sided blocking join is the
    * PRODUCT of the two sides' bucket sizes — a low-entropy segment shared
    * by s seg rows and w window rows emits s·w candidates. Measured: the
    * sf0.1 fixture's worst key product is ~37k (short 2-char segments of
    * short keys), while 100x-replicated corpora produce suffix-free shared
    * segments at 10^7–10^8 (the round-14 OOM that motivated this guard) —
    * 1e6 sits 25x above everything any verify fixture reaches and ~100x
    * below the pathology. Same oracle-coupling contract as
    * [[DefaultMaxBucket]]: engagement registers in [[guardEngagements]]
    * and makes the oracle non-comparable for that run.
    */
  val DefaultMaxJoinPairs = 1000000L

  /** The fuzzy joins' guarded candidate join: equi-join `segSide` (id =
    * `sidCol`) against `winSide` (id = `widCol`) on `keys`, except keys
    * whose pair product exceeds `maxPairs` switch to the star expansion —
    * every member (either side) links to the key's min seg-side id instead
    * of all-pairs. Star pairs still pass through the caller's EXACT
    * levenshtein verify, so an engaged bucket contributes hub-verified
    * pairs only (the d8 contract: transitive duplicates reach the hub;
    * arbitrary pairs inside a boilerplate bucket are not enumerated).
    * Returns normalized (a, b) with a < b; caller dedups/verifies.
    *
    * Both sides are consumed twice (size pass + join) but deliberately NOT
    * checkpointed (round-21): they are map-only explodes over the caller's
    * already-checkpointed `rows` frame, so the recompute pipelines into
    * each consumer's shuffle map stage for free, while materializing them
    * cost two barrier jobs plus a write per join — pure overhead at every
    * scale (the shuffled bytes are identical either way). The size pass is
    * two map-side-combinable counts, so DETECTING an explosive key never
    * materializes its pairs. Oversized keys number at most
    * |candidates|/maxPairs — broadcastable by construction.
    */
  private def guardedSegWinJoin(segSide: DataFrame, winSide: DataFrame,
      keys: Seq[String], sidCol: String, widCol: String, what: String,
      maxPairs: Long): DataFrame = {
    val kc = keys.map(col)
    val seg = segSide
    val win = winSide
    def norm(df: DataFrame, a: String, b: String): DataFrame = df
      .filter(col(a) =!= col(b))
      .select(least(col(a), col(b)).as("a"), greatest(col(a), col(b)).as("b"))
    val over = seg.groupBy(kc: _*).agg(count(lit(1)).as("__ns"))
      .join(win.groupBy(kc: _*).agg(count(lit(1)).as("__nw")), keys)
      .withColumn("__np", col("__ns") * col("__nw"))
      .filter(col("__np") > maxPairs)
    val st = over.agg(count(lit(1)).as("k"), sum(col("__np")).as("m"),
      max(col("__np")).as("big")).collect()(0)
    if (st.getLong(0) == 0L) norm(seg.join(win, keys), sidCol, widCol)
    else {
      log.warn(s"$what pair-volume guard engaged: ${st.getLong(0)} join key(s) " +
        s"exceed $maxPairs candidate pairs (largest ${st.getLong(2)}, " +
        s"${st.getLong(1)} total); oversized keys star-link to the min " +
        "seg-side id instead of expanding the product")
      guardEngagements.add(what)
      val overKeys = over.select(kc: _*)
      val clean = norm(
        seg.join(broadcast(overKeys), keys, "left_anti").join(win, keys),
        sidCol, widCol)
      val reps = seg.join(broadcast(overKeys), keys, "left_semi")
        .groupBy(kc: _*).agg(min(col(sidCol)).as("__rep"))
      val starsSeg = norm(
        seg.join(broadcast(reps), keys).select(col("__rep"), col(sidCol)),
        "__rep", sidCol)
      val starsWin = norm(
        win.join(broadcast(reps), keys).select(col("__rep"), col(widCol)),
        "__rep", widCol)
      clean.unionByName(starsSeg).unionByName(starsWin)
    }
  }

  /** Scalable edit-distance self-join via pigeonhole segment blocking
    * (the PassJoin shape): O(n·d) blocking keys replace the O(n²)
    * cross-join, and the exact `levenshtein` runs only on candidates.
    *
    * Lemma (lossless blocking): partition a length-L string `a` into
    * d+1 contiguous segments. If edit(a, b) <= d, at least one segment
    * of `a` survives error-free, and the <= d edits before it shift its
    * aligned copy in `b` by at most d positions. So `b` contains that
    * exact segment starting within ±d of its position in `a` — joining
    * a's exact segments against b's ±d-windowed substrings on
    * (segment index, text) can MISS no true pair. It can only over-match,
    * and the verify stage keeps exactly `levenshtein <= d` (the ld2
    * oracle replays the full quadratic join in DuckDB — fixture-scale
    * proof the blocking dropped nothing).
    *
    * Rows whose string length != `strLen` are dropped — the equal-length
    * contract keeps the window positions compile-time constants (callers
    * key on fixed-length prefixes/fingerprints; variable-length corpora
    * add a ±d length band and per-length windows).
    *
    * Scale posture: segment side is (d+1)·n rows, window side
    * <= (d+1)·(2d+1)·n rows (deduped per doc), joined on (i, substring) —
    * equi-join, no cross-join anywhere (RegistryPlanSpec's registry-wide
    * gate sees this plan). A boilerplate-heavy corpus can still make one
    * 7-char segment hot — the [[DefaultMaxJoinPairs]] pair-volume guard
    * star-links such keys (measured necessary: the 100x-replicated sweep
    * OOM'd an 8g heap on suffix-free shared segments before the guard).
    */
  def editDistanceJoin(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, strLen: Int,
      maxJoinPairs: Long = DefaultMaxJoinPairs): DataFrame = {
    require(maxDist >= 1 && strLen >= (maxDist + 1) * 2,
      s"need strLen >= ${(maxDist + 1) * 2} for $maxDist-edit segments")
    val k = maxDist + 1
    val base = strLen / k
    val lens = Seq.tabulate(k)(i => if (i < strLen % k) base + 1 else base)
    val starts = lens.scanLeft(1)(_ + _).init // 1-based substring positions
    // tracked: seg side, window side, guard counts, and the two verify
    // joins all re-consume this projection
    val rows = graft.ops.Checkpoints.tracked(
      df.select(col(idCol), col(strCol))
        .where(length(col(strCol)) === strLen))
    val segSide = rows.select(col(idCol).as("__sid"), explode(array(
        starts.indices.map(i => struct(lit(i).as("i"),
          substring(col(strCol), starts(i), lens(i)).as("s"))): _*)).as("e"))
      .select(col("__sid"), col("e.i").as("__i"), col("e.s").as("__s"))
    // window positions are compile-time constants: clamp ±d to the string,
    // dedup the clamped collisions
    val winPos = (for {
      i <- starts.indices
      sh <- -maxDist to maxDist
      p = math.min(math.max(starts(i) + sh, 1), strLen - lens(i) + 1)
    } yield (i, p, lens(i))).distinct
    val winSide = rows.select(col(idCol).as("__wid"), explode(array(
        winPos.map { case (i, p, l) => struct(lit(i).as("i"),
          substring(col(strCol), p, l).as("s")) }: _*)).as("e"))
      .select(col("__wid"), col("e.i").as("__i"), col("e.s").as("__s"))
      .dropDuplicates("__wid", "__i", "__s")
    val cand = guardedSegWinJoin(segSide, winSide, Seq("__i", "__s"),
      "__sid", "__wid", "editDistanceJoin segments", maxJoinPairs).distinct()
    verifyPairs(cand, rows, idCol, strCol, maxDist)
  }

  /** The fuzzy joins' exact-verify stage: join candidate (a, b) pairs back
    * to their strings and keep edit distance <= maxDist. Uses the
    * THRESHOLDED levenshtein (banded O(d·n) DP, early exit, -1 past the
    * threshold) — per-candidate cost drops from O(n^2) to O(d·n), which is
    * the verify stage's whole bill at corpus scale. For kept rows the
    * thresholded value IS the exact distance, so oracles are unaffected.
    */
  private def verifyPairs(cand: DataFrame, rows: DataFrame, idCol: String,
      strCol: String, maxDist: Int): DataFrame =
    cand
      .join(rows.select(col(idCol).as("a"), col(strCol).as("__pa")), "a")
      .join(rows.select(col(idCol).as("b"), col(strCol).as("__pb")), "b")
      .withColumn("dist",
        levenshtein(col("__pa"), col("__pb"), maxDist).cast("bigint"))
      .filter(col("dist") >= 0) // -1 = "beyond maxDist"
      .select(col("a"), col("b"), col("dist"))

  /** Variable-length [[editDistanceJoin]] — the production PassJoin shape:
    * no fixed-length contract, strings are banded by length (a true pair
    * satisfies |len(a)−len(b)| <= d, so only d+1 source lengths need keys).
    *
    * Two lossless candidate routes, unioned then exact-verified:
    *
    * LONG route (both strings >= 2·(d+1) chars): the ld2 pigeonhole, with
    * segment boundaries now RUNTIME expressions of the source length La —
    * the seg side keys (i, La, exact segment of a); the window side, for
    * each source length La in [Lb−d, Lb+d] it could pair with, keys
    * (i, La, ±d-shifted window of b cut to La's segment geometry). Same
    * lemma as ld2 per (La, Lb) pair; enumerating La costs a (2d+1)× row
    * factor on the window side only.
    *
    * SHORT route (any pair whose shorter string < 2·(d+1) chars — segments
    * would shrink below the d-shift resolution, and a pair can spend one
    * edit per nonempty segment): all-pairs within a length band, keyed by
    * target length (probe emits [L, L+d], anchor emits L, so each pair
    * meets exactly once at the longer length — an equi-join, never a
    * cartesian). Deliberately exhaustive: a corpus that fuzzy-joins on
    * keys this short is degenerate by construction (callers key on
    * prefixes or fingerprints long enough to discriminate). Bucket sizes
    * are
    * per-length string counts — the one shape here a pathological corpus
    * could make hot, and the reason the long route exists at all.
    *
    * Pairs with both strings in the overlap band [2(d+1), 2(d+1)+d−1] are
    * found by both routes; the normalize-distinct collapses them. The ld3
    * oracle replays the full quadratic join in DuckDB, so losslessness is
    * hash-checked at fixture scale, not argued.
    */
  def editDistanceJoinVarLen(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, maxJoinPairs: Long = DefaultMaxJoinPairs): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    val d = maxDist
    val k = d + 1
    val minLong = 2 * k           // long-route floor: every segment >= 2 chars
    val shortMax = minLong + d - 1 // any partner of a sub-minLong string

    // tracked: consumed by both routes' guard passes AND the verify joins
    // (6 consumers) — one checkpoint replaces six source re-evaluations.
    // Empty strings stay in: ("", x) with len(x) <= d is a true pair and
    // the short route's length band handles L = 0 like any other length.
    val rows = graft.ops.Checkpoints.tracked(
      df.select(col(idCol).as("__id"), col(strCol).as("__str"))
        .where(col(strCol).isNotNull)
        .withColumn("__len", length(col("__str"))))

    // ---- short route: per-length-band all-pairs (equi-join on target len)
    val shorts = rows.filter(col("__len") <= shortMax)
    val probe = shorts.select(col("__id").as("__pid"), col("__len").as("__pl"),
      explode(sequence(col("__len"), col("__len") + d)).as("__bkt"))
    val anchor = shorts.select(col("__id").as("__aid"), col("__len").as("__bkt"))
    val shortCand = guardedSegWinJoin(probe, anchor, Seq("__bkt"),
      "__pid", "__aid", "editDistanceJoinVarLen short band", maxJoinPairs)

    // ---- long route: runtime-geometry pigeonhole segments
    // segment i of a length-La string: len = La/k (+1 for i < La%k),
    // start = 1 + i·(La/k) + min(i, La%k) — exact integer arithmetic
    def segLen(la: Column, i: Column): Column =
      (((la - la % k) / k).cast("int") + when(i < la % k, 1).otherwise(0))
        .cast("int")
    def segStart(la: Column, i: Column): Column =
      (lit(1) + i * ((la - la % k) / k).cast("int") + least(i, la % k))
        .cast("int")
    val iSeq = sequence(lit(0), lit(d))
    val longs = rows.filter(col("__len") >= minLong)
    val segSide = longs.select(col("__id").as("__sid"),
        explode(transform(iSeq, i => struct(i.as("i"),
          col("__len").as("la"),
          col("__str").substr(segStart(col("__len"), i),
            segLen(col("__len"), i)).as("s")))).as("e"))
      .select(col("__sid"), col("e.i").as("__i"), col("e.la").as("__la"),
        col("e.s").as("__s"))
    // window side: one row per candidate source length La (>= minLong keeps
    // sequence() ascending — shorter partners belong to the short route),
    // then every segment index × ±d shift, clamped into the string
    val winSide = longs
      .select(col("__id").as("__wid"), col("__str"), col("__len"),
        explode(sequence(greatest(lit(minLong), col("__len") - d),
          col("__len") + d)).as("__la"))
      .select(col("__wid"), col("__la"), explode(flatten(transform(iSeq,
        i => transform(sequence(lit(-d), lit(d)), sh => {
          val l = segLen(col("__la"), i)
          val p = least(greatest(segStart(col("__la"), i) + sh, lit(1)),
            (col("__len") - l + 1).cast("int"))
          struct(i.as("i"), col("__str").substr(p, l).as("s"))
        })))).as("e"))
      .select(col("__wid"), col("__la"), col("e.i").as("__i"),
        col("e.s").as("__s"))
      .dropDuplicates("__wid", "__la", "__i", "__s")
    val longCand = guardedSegWinJoin(segSide, winSide, Seq("__i", "__la", "__s"),
      "__sid", "__wid", "editDistanceJoinVarLen segments", maxJoinPairs)

    // ---- union, dedup, exact verify
    verifyPairs(shortCand.unionByName(longCand).distinct(),
      rows, "__id", "__str", d)
  }

  /** Word n-gram shingles (0-based `getItem`); input must have >= n words. */
  def shingles(words: Column, n: Int = 3): Column =
    transform(sequence(lit(0), size(words) - n),
      i => concat_ws(" ", (0 until n).map(o => element_at(words, i + o + 1)): _*))

  /** Attach a MinHash signature column: an array of `num` (even) hex-string
    * minima.
    *
    * Hash economics: md5 evaluation dominates signature cost at scale, so
    * each seeded md5 yields TWO independent 60-bit hash values (hex chars
    * 1-15 and 17-31) — num hashes for num/2 md5 calls per shingle:
    * h_{2i}(S)   = min over s of md5(i|s)[1..15]
    * h_{2i+1}(S) = min over s of md5(i|s)[17..31]
    *
    * Shaped as a DataFrame transform (not a pure Column) so each seed's md5
    * array binds to a real intermediate column used twice — CollapseProject
    * keeps expensive twice-referenced projections separate, guaranteeing one
    * md5 pass; a duplicated Column tree would silently evaluate twice.
    */
  def withMinhashSig(df: DataFrame, shCol: String, outCol: String, num: Int = 8): DataFrame = {
    require(num % 2 == 0, s"minhash num must be even, got $num")
    val seeds = 0 until num / 2
    val withMds = seeds.foldLeft(df) { (d, i) =>
      d.withColumn(s"__md$i",
        transform(col(shCol), s => md5(concat(lit(s"$i|"), s).cast("binary"))))
    }
    val entries = (0 until num).map { j =>
      array_min(transform(col(s"__md${j / 2}"),
        m => substring(m, 1 + 16 * (j % 2), 15)))
    }
    withMds.withColumn(outCol, array(entries: _*))
      .drop(seeds.map(i => s"__md$i"): _*)
  }

  /** LSH banding: split the signature into bands of `rowsPerBand` hashes;
    * docs sharing any full band are candidates. P(candidate) = 1-(1-J^r)^b —
    * with r=2, b=4 the S-curve centers near J≈0.5, which keeps skewed
    * vocabularies from exploding bucket sizes (r=1 buckets on any shared
    * min-shingle; r>=2 requires agreement on r independent minima).
    */
  def lshBandKeys(df: DataFrame, idCol: String, sigCol: String,
      rowsPerBand: Int = 2, numBands: Int = 4,
      carry: Seq[String] = Nil): DataFrame = {
    val bands = transform(sequence(lit(0), lit(numBands - 1)),
      i => concat_ws("|", slice(col(sigCol), i * rowsPerBand + lit(1), lit(rowsPerBand))))
    // carry: extra columns to ride along (e.g. the event-time column the
    // streaming TTL variant keys its watermark on)
    df.select(col(idCol) +: carry.map(col) :+ posexplode(bands).as(Seq("band", "h")): _*)
      .select(col(idCol) +: carry.map(col)
        :+ concat_ws(":", col("band"), col("h")).as("band_key"): _*)
  }

  /** Distinct candidate pairs (a < b) from shared band keys.
    *
    * Shape: group ids per band bucket, then expand pairs inside each bucket
    * with two chained explodes — ONE pass over the (expensive) signatures
    * instead of a self-join that recomputes the minhash lineage for both
    * sides. Bucket sizes are bounded by the r>=2 banding (SCALE.md), so the
    * within-bucket expansion is small on real near-dup data.
    *
    * SKEW GUARD: buckets above `maxBucket` (a template-boilerplate or
    * empty-doc band key on a crawl) switch to the STAR expansion — every
    * member pairs with the bucket's minimum id only. That bounds both the
    * pair count (n-1 instead of n(n-1)/2 per bucket) and task memory (the
    * oversized path is groupBy-min + an equi-join against the broadcast
    * oversized-key set — no collect_set buffer ever holds an oversized
    * bucket). Connectivity through the bucket is preserved exactly, so the
    * downstream connected-components clustering — the reason candidates
    * exist — reaches the same clusters whenever in-bucket members truly
    * are mutual duplicates (the pathological case: byte-identical docs all
    * verify against the representative). The recall trade on MIXED giant
    * buckets is explicit and logged, never silent. With no oversized
    * bucket (every fixture here) the plan and results are EXACTLY the
    * unguarded all-pairs form.
    *
    * `materialize` checkpoints the pruned band keys so the guard's size
    * pass and the pair pass share one evaluation of the (expensive)
    * signature lineage; pass false when `bandKeys` is already a persisted
    * table (d3b's bucketed layout — both aggregations then read the
    * bucket layout exchange-free, and a checkpoint would destroy that).
    */
  def candidatePairs(bandKeys: DataFrame, idCol: String,
      maxBucket: Int = DefaultMaxBucket, materialize: Boolean = true): DataFrame = {
    val pruned = bandKeys.select(col("band_key"), col(idCol))
    val bk = if (materialize) graft.ops.Checkpoints.tracked(pruned) else pruned
    def allPairs(in: DataFrame): DataFrame = in
      .groupBy("band_key").agg(collect_set(col(idCol)).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a"), explode(col("ids")).as("b"))
      .filter(col("a") < col("b"))
    oversizedKeys(bk, Seq("band_key"), maxBucket, "LSH candidatePairs") match {
      case None => allPairs(bk).distinct()
      case Some(over) =>
        val small = allPairs(bk.join(broadcast(over), Seq("band_key"), "left_anti"))
        val mins = bk.join(broadcast(over), Seq("band_key"), "left_semi")
          .groupBy("band_key").agg(min(col(idCol)).as("__rep"))
        val stars = bk.join(broadcast(mins), Seq("band_key"))
          .filter(col(idCol) =!= col("__rep"))
          .select(col("__rep").as("a"), col(idCol).as("b"))
        small.unionByName(stars).distinct()
    }
  }

  /** SimHash band candidates — the simhash flavor of LSH dedup: split the
    * 60-bit hash into 4 x 15-bit bands; docs agreeing on ANY band are
    * candidates, then the exact Hamming distance verifies. By pigeonhole the
    * composition is EXACT for hamming <= 3 (four bands can't all differ),
    * so unlike MinHash banding there are no false negatives at that radius.
    *
    * One pass: (id, simhash) structs ride the bucket collect, so the
    * verify stage reads the carried hashes — no join back to the signature
    * table. Same skew guard as [[candidatePairs]]: buckets above
    * `maxBucket` star-link members to the min-id representative (carrying
    * its simhash via min_by, so the Hamming verify still runs per star
    * pair — identical docs pass at distance 0) instead of expanding
    * all-pairs; results are exactly the unguarded form when no bucket
    * overflows.
    */
  def simhashCandidates(sigs: DataFrame, idCol: String, shCol: String,
      maxHamming: Int = 3, maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val bandVals = array((0 until 4).map(i =>
      shiftright(col(shCol), i * 15).bitwiseAND(lit(0x7FFFL))): _*)
    val bk = graft.ops.Checkpoints.tracked(
      sigs.select(col(idCol), col(shCol), posexplode(bandVals).as(Seq("band", "bval"))))
    def verified(in: DataFrame): DataFrame = in
      .groupBy("band", "bval")
      .agg(collect_set(struct(col(idCol).as("id"), col(shCol).as("sh"))).as("members"))
      .filter(size(col("members")) > 1)
      .select(explode(col("members")).as("x"), col("members"))
      .select(col("x"), explode(col("members")).as("y"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).cast("bigint").as("hamming"))
      .filter(col("hamming") <= maxHamming)
    oversizedKeys(bk, Seq("band", "bval"), maxBucket, "SimHash candidates") match {
      case None => verified(bk).distinct()
      case Some(over) =>
        val small = verified(bk.join(broadcast(over), Seq("band", "bval"), "left_anti"))
        val reps = bk.join(broadcast(over), Seq("band", "bval"), "left_semi")
          .groupBy("band", "bval")
          .agg(min_by(struct(col(idCol).as("id"), col(shCol).as("sh")), col(idCol))
            .as("rep"))
        val stars = bk.join(broadcast(reps), Seq("band", "bval"))
          .filter(col("rep.id") < col(idCol))
          .select(col("rep.id").as("a"), col(idCol).as("b"),
            bit_count(col("rep.sh").bitwiseXOR(col(shCol))).cast("bigint").as("hamming"))
          .filter(col("hamming") <= maxHamming)
        small.unionByName(stars).distinct()
    }
  }

  /** LSH candidates WITH the MinHash Jaccard estimate: matching signature
    * positions / signature length — the sketch-only verify stage (no raw
    * text touched, exact multiples of 1/num so engine-exact). Signatures
    * ride the bucket collect like [[simhashCandidates]], and the same skew
    * guard applies: oversized buckets star-link to the min-id member (its
    * signature carried via min_by, so est_j is still computed per star
    * pair — identical docs estimate 1.0).
    */
  def candidatePairsWithEstimate(sigs: DataFrame, idCol: String, sigCol: String,
      rowsPerBand: Int = 2, numBands: Int = 4,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val bands = transform(sequence(lit(0), lit(numBands - 1)),
      i => concat_ws("|", slice(col(sigCol), i * rowsPerBand + lit(1), lit(rowsPerBand))))
    def estJ(x: Column, y: Column): Column =
      aggregate(
        zip_with(x, y, (p, q) => when(p === q, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).cast("double") / size(x).cast("double")
    val bk = graft.ops.Checkpoints.tracked(
      sigs.select(col(idCol), col(sigCol), posexplode(bands).as(Seq("band", "h")))
        .select(col(idCol), col(sigCol),
          concat_ws(":", col("band"), col("h")).as("band_key")))
    def estimated(in: DataFrame): DataFrame = in
      .groupBy("band_key")
      .agg(collect_set(struct(col(idCol).as("id"), col(sigCol).as("sig"))).as("members"))
      .filter(size(col("members")) > 1)
      .select(explode(col("members")).as("x"), col("members"))
      .select(col("x"), explode(col("members")).as("y"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        estJ(col("x.sig"), col("y.sig")).as("est_j"))
    oversizedKeys(bk, Seq("band_key"), maxBucket, "LSH candidatePairsWithEstimate") match {
      case None => estimated(bk).distinct()
      case Some(over) =>
        val small = estimated(bk.join(broadcast(over), Seq("band_key"), "left_anti"))
        val reps = bk.join(broadcast(over), Seq("band_key"), "left_semi")
          .groupBy("band_key")
          .agg(min_by(struct(col(idCol).as("id"), col(sigCol).as("sig")), col(idCol))
            .as("rep"))
        val stars = bk.join(broadcast(reps), Seq("band_key"))
          .filter(col("rep.id") < col(idCol))
          .select(col("rep.id").as("a"), col(idCol).as("b"),
            estJ(col("rep.sig"), col(sigCol)).as("est_j"))
        small.unionByName(stars).distinct()
    }
  }

  /** Set Jaccard of two shingle arrays (distinct semantics, like
    * array_intersect/union).
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** SimHash (60-bit): per bit, majority vote of word-hash bits weighted by
    * occurrence. Word hash = first 15 md5 hex chars as an integer (portable:
    * the DuckDB oracle computes the identical value). Nested higher-order
    * functions, fully codegen'd.
    */
  def simhash(words: Column): Column = {
    val hs = transform(words, x => conv(substring(md5(x.cast("binary")), 1, 15), 16, 10).cast("bigint"))
    val bits = transform(sequence(lit(0), lit(59)), b =>
      when(
        aggregate(hs, lit(0L),
          (acc, h) => acc +
            when(call_function("shiftright", h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L)
        ) > 0,
        call_function("shiftleft", lit(1L), b)
      ).otherwise(0L))
    aggregate(bits, lit(0L), (acc, x) => acc + x)
  }

  /** Hamming distance between two simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("bigint")

  /** EXACT SUBSTRING SPANS — the ExactSubstr dedup of Lee et al. 2021
    * ("Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499): per document, the maximal verbatim token spans
    * whose every length-`k` window also occurs in an EARLIER document
    * (first-occurrence-wins, the d16 convention). The paper builds one
    * corpus-wide suffix array — a single-machine design. The distributed
    * form: slide a k-token window over every doc (stride 1, where d16's
    * chunks are disjoint), key windows by md5, resolve each window's first
    * owner with a map-side-combining min() aggregate (never a per-hash
    * window sort — the d16 skew argument: a boilerplate k-gram shared by
    * millions of docs costs one tiny aggregate buffer), join back, and
    * merge consecutive duplicated positions into maximal spans with one
    * per-doc gaps-and-islands window (per-partition work bounded by doc
    * length). Two keyed exchanges over corpus-linear rows; nothing
    * pairwise, no global structure.
    *
    * Semantics note: within a merged span, different windows may match
    * DIFFERENT earlier documents — the guarantee is "every length-k
    * substring of this span occurs earlier", the k-gram relaxation of the
    * suffix array's true maximal matches, and exactly the criterion
    * span-removal pipelines act on (a span none of whose k-grams are novel
    * carries no new text at granularity k).
    *
    * Output: one row per surviving span — (id, start_pos, span_len), both
    * token-indexed; spans shorter than `minSpan` tokens are dropped.
    */
  def substringSpans(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 5, minSpan: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(minSpan >= k, s"a span is at least one window: minSpan >= k")
    val wins = docs
      .select(col(idCol), split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= k)
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), size(col("w")) - k),
          i => md5(concat_ws(" ", slice(col("w"), i + 1, lit(k))).cast("binary"))))
        .as(Seq("pos", "h")))
      // read twice (owner aggregate + probe side) — run the corpus-wide
      // explode+md5 once, not once per consumer (the d16 convention)
      .trackedCheckpoint()
    val owners = wins.groupBy("h").agg(min(col(idCol)).as("first_id"))
    val dupPos = wins.join(owners, "h")
      .filter(col("first_id") < col(idCol))
      .select(col(idCol), col("pos"))
    // gaps-and-islands: consecutive duplicated positions share
    // pos - row_number(); each island is one maximal span
    val byDoc = Window.partitionBy(idCol).orderBy("pos")
    dupPos
      .withColumn("grp", col("pos") - row_number().over(byDoc))
      .groupBy(col(idCol), col("grp"))
      .agg(min(col("pos")).cast("bigint").as("start_pos"),
        (max(col("pos")) - min(col("pos")) + k).cast("bigint").as("span_len"))
      .filter(col("span_len") >= minSpan)
      .select(col(idCol), col("start_pos"), col("span_len"))
  }

  /** Dedup cluster resolution: connected components over candidate pairs by
    * iterative min-label propagation. Candidates alone don't dedup a corpus —
    * transitive duplicates (a~b, b~c) must collapse to one survivor, so each
    * node gets the minimum reachable id as its cluster, and the survivor is
    * the node equal to its cluster id.
    *
    * Each iteration is one join + aggregate over the edge list; label count
    * converges in O(log diameter) rounds (near-dup clusters are shallow —
    * `maxIter` 10 covers diameter ~1000). The driver loop only checks a
    * scalar convergence count per round; labels never leave the cluster.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    // Materialize the PAIRS (not the doubled edge list): a union of
    // pairs-with-itself-swapped puts the expensive upstream lineage (for LSH
    // input, the entire MinHash pipeline) into BOTH union branches of the
    // checkpoint job — it would execute twice. Checkpoint the single pass,
    // then derive both edge directions from the cached blocks.
    val p = pairs.select(col("a"), col("b")).trackedCheckpoint()
    val edges = p.select(col("a").as("src"), col("b").as("dst"))
      .union(p.select(col("b").as("src"), col("a").as("dst")))
    val nodes = edges.select(col("src").as("node")).distinct()
    var labels = nodes.withColumn("label", col("node"))
    val labelType = labels.schema("label").dataType
    var checkpointed: DataFrame = null
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // candidate label for each node: min over itself and neighbors' labels.
      // The self rows also CARRY the previous label through the aggregate
      // (each node contributes exactly one self row, so max(old) recovers
      // it), which makes the convergence check a filter on the materialized
      // frame instead of an extra old⋈new shuffle join per round.
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .select(col("src").as("node"), col("label").as("contrib"),
          lit(null).cast(labelType).as("old"))
      // Checkpoint BEFORE the convergence check: it cuts the growing lineage
      // and means the join+aggregate runs once per round (the check then
      // reads the materialized frame, not the lineage a second time).
      val next = labels
        .select(col("node"), col("label").as("contrib"), col("label").as("old"))
        .union(viaNeighbors)
        .groupBy("node").agg(min(col("contrib")).as("label"), max(col("old")).as("old"))
        .trackedCheckpoint()
      val changed = next.filter(col("label") =!= col("old")).limit(1).count()
      // free the previous round's blocks NOW (the scope would only free
      // them at face end — O(iterations) accumulation for deep loops);
      // release, not unpersist: see Checkpoints.release
      if (checkpointed != null) graft.ops.Checkpoints.release(checkpointed)
      checkpointed = next
      labels = next.select("node", "label")
      converged = changed == 0
      iter += 1
    }
    // After >=1 iteration labels is checkpointed and no longer needs the
    // pair blocks (with maxIter=0 the un-iterated labels still would).
    if (iter > 0) graft.ops.Checkpoints.release(p)
    labels.select(col("node").as("doc_id"), col("label").as("cluster"))
  }

  /** Size gate for the driver-local union-find finish (see
    * [[localComponents]]): edge lists at or below this row count are
    * resolved on the driver in one bounded collect instead of O(rounds)
    * cluster barriers. 2M edges ≈ 32 MB of raw longs (~100 MB as JVM
    * tuples) — far below driver headroom, and >2000x the densest verify
    * fixture's pair count. Parameterized (scale deployments tune or
    * disable it via the session conf; <= 0 disables), NOT a constant
    * tuned to local mode: at 100 TB the INITIAL pair set blows past any
    * sane gate and the distributed rounds run unchanged — the gate's
    * production value is the CONTRACTED graph inside the star re-route,
    * which shrinks geometrically and crosses the gate after a few rounds,
    * cutting the O(log n) round tail (each round = 2 shuffles + an
    * exceptAll fixpoint probe) to one bounded collect.
    */
  private def localMaxEdges(df: DataFrame): Long =
    df.sparkSession.conf.getOption("spark.graft.cc.localMaxEdges")
      .flatMap(_.toLongOption).getOrElse(2000000L)

  /** Driver-local connected components over a BOUNDED integral-keyed edge
    * list: one collect, one union-find pass (min id as component root —
    * exactly the "min reachable id" contract of the distributed
    * resolvers, so labels are bit-identical), one parallelize back.
    *
    * Returns None when the id type is not integral — Spark's min/least on
    * strings order by UTF-8 bytes while JVM String ordering is UTF-16
    * code-unit based (they diverge on supplementary characters), so
    * non-integral keys keep the distributed path rather than risk a
    * root-choice mismatch.
    *
    * The caller gates on [[localMaxEdges]] BEFORE collecting (the count
    * runs over already-checkpointed blocks), so the collect is bounded by
    * construction — this is the standard endgame of iterative graph
    * contraction (finish locally once the active graph fits), not an
    * unbounded driver loop.
    */
  private def localComponents(p: DataFrame): Option[DataFrame] = {
    import org.apache.spark.sql.types._
    val dt = p.schema("a").dataType
    val integral = dt == LongType || dt == IntegerType || dt == ShortType
    if (!integral || p.schema("b").dataType != dt) None
    else {
      // null endpoints are dropped, matching the distributed path (whose
      // equi-joins never match null keys) — Row.getLong would silently
      // read a null as node 0 (round-20 advice)
      val edges = p.select(col("a").cast("long"), col("b").cast("long"))
        .filter(col("a").isNotNull && col("b").isNotNull)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // index nodes; union-find with the SMALLER id winning root status
      val idx = scala.collection.mutable.HashMap.empty[Long, Int]
      val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
      def nodeOf(id: Long): Int =
        idx.getOrElseUpdate(id, { ids += id; ids.length - 1 })
      val parent = scala.collection.mutable.ArrayBuffer.empty[Int]
      def find(x0: Int): Int = {
        var x = x0
        while (parent(x) != x) {
          parent(x) = parent(parent(x)) // path halving
          x = parent(x)
        }
        x
      }
      edges.foreach { case (a, b) =>
        val ia = nodeOf(a); val ib = nodeOf(b)
        while (parent.length < ids.length) parent += parent.length
        val ra = find(ia); val rb = find(ib)
        if (ra != rb) {
          // root = the member with the smaller ORIGINAL id
          if (ids(ra) <= ids(rb)) parent(rb) = ra else parent(ra) = rb
        }
      }
      val spark = p.sparkSession
      import spark.implicits._
      // Above ~100k labels, parallelize instead of toDF-on-a-Seq: a local
      // Seq becomes a LocalRelation embedded (and re-serialized) in EVERY
      // downstream consumer's plan — at the 2M-edge gate that is up to ~4M
      // boxed rows riding each plan tree (round-20 advice). An RDD-backed
      // frame ships the rows once. BELOW the threshold the LocalRelation
      // stays deliberately: its exact size statistic is what lets the
      // consumers' anti-joins pick a broadcast build directly (an RDD scan
      // reports unknown stats and would demote them to sort-merge).
      val rows = ids.indices.map(i => (ids(i), ids(find(i))))
      val labels =
        if (rows.length <= 100000) rows.toDF("doc_id", "cluster")
        else spark.sparkContext.parallelize(rows,
          math.max(1, math.min(spark.sparkContext.defaultParallelism,
            rows.length / 100000))).toDF("doc_id", "cluster")
      Some(
        if (dt == LongType) labels
        else labels.select(col("doc_id").cast(dt).as("doc_id"),
          col("cluster").cast(dt).as("cluster")))
    }
  }

  /** ADAPTIVE cluster resolution — the production entry point (d7/d12/d13
    * route through this): start with min-label propagation (one join +
    * aggregate per round, unbeatable on the shallow star-shaped clusters
    * near-dup corpora actually produce), but WATCH THE LABEL CHURN. On a
    * shallow graph churn collapses after round one (every member adopts
    * the cluster min immediately); on a chain-shaped component (template
    * corpora where doc i only pairs with doc i±1) the min only travels one
    * hop per round, so churn stays ~constant — O(diameter) rounds, the
    * pathology d14's star contraction exists for. When churn stops
    * decaying (round r >= 2 with churn_r > `churnDecay` x churn_{r-1}),
    * re-route: CONTRACT the pairs through the labels propagation already
    * earned (shrinking the graph by every finished cluster) and finish
    * with [[connectedComponentsStar]]'s O(log n) rounds on the contracted
    * graph, composing labels on the way out. Either path yields min
    * reachable id per node, so the result is algorithm-independent —
    * d7/d12/d13's oracles (full-rebuild CC) hold on both routes.
    *
    * vs [[connectedComponents]]: the router needs the real per-round
    * churn COUNT, not the 0/1 convergence probe — one extra filter+count
    * job per probe round over already-materialized blocks.
    */
  def connectedComponentsAuto(pairs: DataFrame, maxIter: Int = 10): DataFrame =
    ccAutoRouted(pairs, maxIter)._1

  /** [[connectedComponentsAuto]] with the route decision exposed (spec
    * observability): `_2` is true iff the star re-route engaged.
    */
  private[graft] def ccAutoRouted(pairs: DataFrame, maxIter: Int = 10,
      churnDecay: Double = 0.75): (DataFrame, Boolean) = {
    val p = pairs.select(col("a"), col("b")).trackedCheckpoint()
    // ENTRY GATE: a bounded edge list resolves on the driver in one
    // union-find pass — same min-reachable-id labels, none of the
    // O(rounds) checkpoint+count barriers (measured: sd1's 943-pair CC
    // cost ~90 Spark jobs through propagation + star rounds). The count
    // reads the just-materialized checkpoint blocks; at 100 TB it is the
    // one cheap action before the distributed rounds engage.
    val gate = localMaxEdges(p)
    if (gate > 0 && p.count() <= gate) {
      localComponents(p) match {
        case Some(labels) =>
          graft.ops.Checkpoints.release(p)
          return (labels, false)
        case None => () // non-integral ids: distributed path below
      }
    }
    val edges = p.select(col("a").as("src"), col("b").as("dst"))
      .union(p.select(col("b").as("src"), col("a").as("dst")))
    val nodes = edges.select(col("src").as("node")).distinct()
    var labels = nodes.withColumn("label", col("node"))
    val labelType = labels.schema("label").dataType
    var checkpointed: DataFrame = null
    var iter = 0
    var converged = false
    var route = false
    // Explicit trigger record: inferring the cause from `iter >= maxIter`
    // after the loop mis-classified a churn-decay trigger that happened to
    // fire on the final permitted round (round-10 advice) — that re-route
    // ran with NO log line. Exactly one of these is set when route is.
    var routedByDecay = false
    var prevChurn = Long.MaxValue
    while (iter < maxIter && !converged && !route) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .select(col("src").as("node"), col("label").as("contrib"),
          lit(null).cast(labelType).as("old"))
      val next = labels
        .select(col("node"), col("label").as("contrib"), col("label").as("old"))
        .union(viaNeighbors)
        .groupBy("node").agg(min(col("contrib")).as("label"), max(col("old")).as("old"))
        .trackedCheckpoint()
      val churn = next.filter(col("label") =!= col("old")).count()
      if (checkpointed != null) graft.ops.Checkpoints.release(checkpointed)
      checkpointed = next
      labels = next.select("node", "label")
      converged = churn == 0
      iter += 1
      if (!converged && iter >= 2 && churn > churnDecay * prevChurn) {
        route = true
        routedByDecay = true
      }
      prevChurn = churn
    }
    // Loop exhaustion without convergence is ALSO a route trigger: churn
    // decaying by just over (1 - churnDecay) per round on a component with
    // diameter > maxIter would otherwise exit with route=false and silently
    // return non-converged (wrong) labels — the exact silent-truncation flaw
    // the router exists to fix. The star finish below is exact regardless of
    // how propagation stopped, so it always completes the labeling.
    if (!converged && !route) {
      log.warn(s"CC router: propagation exhausted $maxIter rounds without " +
        s"converging (last churn $prevChurn) — finishing with star rounds")
      route = true
    }
    if (!route)
      (labels.select(col("node").as("doc_id"), col("label").as("cluster")), false)
    else {
      // the exhaustion trigger already warned above with the right cause
      if (routedByDecay)
        log.info(s"CC router: label churn stopped decaying after $iter rounds " +
          s"(last $prevChurn) — contracting and finishing with star rounds")
      val la = labels.select(col("node").as("a"), col("label").as("la"))
      val lb = labels.select(col("node").as("b"), col("label").as("lb"))
      // checkpointed: consumed by the size gate's count and then by either
      // finish — and at 100 TB this is where the gate earns its keep: the
      // contracted graph shrinks by every cluster propagation already
      // resolved, so it crosses the bounded-collect threshold long before
      // the star rounds would have converged.
      val contracted = graft.ops.Checkpoints.tracked(
        p.join(la, "a").join(lb, "b")
          .select(least(col("la"), col("lb")).as("a"),
            greatest(col("la"), col("lb")).as("b"))
          .filter(col("a") =!= col("b")).distinct())
      val localFinish =
        if (gate > 0 && contracted.count() <= gate) localComponents(contracted)
        else None
      val starred = localFinish.getOrElse(connectedComponentsStar(contracted))
        .select(col("doc_id").as("label"), col("cluster"))
      // compose: a node's final cluster is its current label's star
      // cluster; labels whose component fully contracted already (no
      // surviving contracted edge) are their own cluster
      (labels.join(starred, Seq("label"), "left")
        .select(col("node").as("doc_id"),
          coalesce(col("cluster"), col("label")).as("cluster")), true)
    }
  }

  /** Connected components by alternating large-star / small-star rounds —
    * the published O(log n)-round MapReduce CC (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14), here as DataFrame
    * groupBy+join rounds. Same contract as [[connectedComponents]]: input
    * candidate pairs (a, b), output (doc_id, cluster = min reachable id)
    * for every node appearing in a pair.
    *
    * Why a second algorithm: min-label propagation needs O(diameter)
    * rounds — fine for shallow near-dup clusters, quadratic wall-clock on
    * pathological chains (a template corpus where doc i only pairs with
    * doc i±1 has diameter = corpus size). Star contraction rewires the
    * edge list itself toward a star forest, halving depth per round pair,
    * so even a 100 TB chain converges in ~log2(n) rounds. Each round is
    * one min-aggregate plus one equi-join on the same key (co-partitioned:
    * AQE reuses the exchange); the driver sees only a scalar
    * changed-edge count per round.
    */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val p = pairs.select(col("a"), col("b")).trackedCheckpoint()
    val nodes = p.select(col("a").as("node"))
      .union(p.select(col("b").as("node"))).distinct()
    // Directed edge list u -> v, deduped; maintained as parent-ish links.
    var edges = p.select(col("a").as("u"), col("b").as("v"))
      .union(p.select(col("b").as("u"), col("a").as("v")))
      .filter(col("u") =!= col("v")).distinct().trackedCheckpoint()
    var edgeCount = edges.count()
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // large-star(u): m = min(Γ(u) ∪ {u}); every BIGGER neighbor v > u
      // re-links to m. Keeps smaller-neighbor edges for small-star.
      val mins = edges.groupBy("u")
        .agg(least(min(col("v")), col("u").cast(edges.schema("v").dataType)).as("m"))
      // one distinct AFTER the union, not one on each branch: the union's
      // distinct already dedups globally, so a per-branch distinct was a
      // full extra Exchange per round doing subset work (round-21; the
      // map-side partial aggregate still shrinks the union's shuffle)
      val afterLarge = edges.join(mins, "u")
        .select(
          when(col("v") > col("u"), col("v")).otherwise(col("u")).as("a"),
          when(col("v") > col("u"), col("m")).otherwise(col("v")).as("b"))
        .filter(col("a") =!= col("b"))
        .select(col("a").as("u"), col("b").as("v"))
        .union(mins.filter(col("m") =!= col("u"))
          .select(col("u"), col("m").as("v")))
        .distinct()
      // small-star(u): among u and its SMALLER-OR-EQUAL neighborhood, all
      // re-link to the minimum. Bigger-neighbor edges pass through (they
      // are that neighbor's smaller edge, handled on its own row).
      val down = afterLarge.filter(col("v") < col("u"))
      val sMins = down.groupBy("u").agg(min(col("v")).as("m"))
      // no distinct here: `next` dedups the symmetrized union globally one
      // line down, so a distinct on relinked was another full subset-work
      // Exchange per round (the afterLarge argument; round-21)
      val relinked = down.join(sMins, "u")
        .select(col("v").as("a"), col("m").as("b"))
        .union(sMins.select(col("u").as("a"), col("m").as("b")))
        .filter(col("a") =!= col("b"))
      val next = relinked
        .select(col("a").as("u"), col("b").as("v"))
        .union(relinked.select(col("b").as("u"), col("a").as("v")))
        .distinct().trackedCheckpoint()
      // Exact convergence: the directed edge set is unchanged. Both sides
      // are DISTINCT sets, so |next| != |edges| alone proves change (one
      // cheap count over the fresh checkpoint), and with EQUAL counts one
      // empty set-difference proves equality (A ⊆ B with |A| = |B| ⇒
      // A = B) — the second exceptAll shuffle of the old probe was
      // redundant every round, and the count-only fast path covers every
      // round that actually changed something.
      val nextCount = next.count()
      val changed =
        if (nextCount != edgeCount) 1L
        else next.exceptAll(edges).limit(1).count()
      graft.ops.Checkpoints.release(edges)
      edges = next
      edgeCount = nextCount
      converged = changed == 0
      iter += 1
    }
    // Star forest: every non-root has its root as its minimum neighbor;
    // roots (the component minima) self-label via the left join.
    val roots = edges.filter(col("v") < col("u"))
      .groupBy("u").agg(min(col("v")).as("cluster"))
      .withColumnRenamed("u", "node")
    nodes.join(roots, Seq("node"), "left")
      .select(col("node").as("doc_id"),
        coalesce(col("cluster"), col("node")).as("cluster"))
  }
}

package graft

import graft.functions.Sketches
import graft.queries.{EventQueries, TextQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts behind the oracle-checked sketch entries
  * (`events_hll_registers`, `events_kmv_overlap`, `events_hll_stream`,
  * `text_winnow`, `text_heavy_hitters`): the oracles pin hash-exact
  * arithmetic; these pin the PROPERTIES that make the sketches
  * usable — estimate accuracy against exact truth, partitioning
  * invariance (the mergeability claim), and winnowing's detection
  * guarantee — none of which an equality oracle can express.
  */
class SketchEntriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("explicit HLL estimate tracks the exact distinct count per type") {
    val est = EventQueries.queries("events_hll_registers")(spark, sf)
      .select(col("event_type"), col("est_r")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(countDistinct(col("event_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (t, e) =>
      val n = exact(t).toDouble
      // m=256 -> std err 1.04/sqrt(256) ~ 6.5% (Flajolet et al. 2007),
      // plus the raw estimator's transition-region bias (the entry is
      // deliberately BRANCH-FREE so it hash-checks at every SF;
      // HyperLogLog++'s bias table exists to shave exactly this).
      // 20% ~ 3 sigma: a register-arithmetic bug lands far outside it
      // (observed at sf0.01: 3-13% across the five types).
      assert(math.abs(e - n) / n <= 0.20,
        s"$t: HLL raw est $e vs exact $n beyond 20% (~3 sigma at m=256)")
    }
  }

  test("HLL registers are partitioning-invariant (the merge-at-100TB claim)") {
    def registers(parts: Int) = {
      val h = Sketches.sketchHash(col("event_id"))
      Tables.events(spark, sf).repartition(parts)
        .select(Sketches.hllBucket(h).as("bucket"), Sketches.hllRho(h).as("rho"))
        .groupBy(col("bucket")).agg(max(col("rho")).as("r"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    }
    assert(registers(1) == registers(16),
      "register max-merge must not depend on how the scan is partitioned")
  }

  test("KMV union estimate tracks the exact union; estimator branch fires at sf0.01") {
    val rows = EventQueries.queries("events_kmv_overlap")(spark, sf).collect()
    assert(rows.length == 10, "5 types -> 10 unordered pairs")
    val exactUsers = Tables.events(spark, sf)
      .filter(col("value") > EventQueries.KmvValueMin)
      .select(col("event_type"), col("user_id")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val exact = (exactUsers(a) ++ exactUsers(b)).size.toDouble
      val est = r.getDouble(3)
      // k=32 KMV relative std err ~ 1/sqrt(k-2) ~ 18%; 3 sigma bound
      assert(math.abs(est - exact) / exact <= 0.55,
        s"($a,$b): union est $est vs exact $exact")
      // at sf0.01 every per-type set exceeds k -> the (k-1)/u_k branch
      assert(est != math.rint(est) || est >= EventQueries.KmvK,
        s"($a,$b): expected the estimator branch, got small-set fallback $est")
    }
  }

  test("winnowing guarantee: a shared token run of length >= G+W-1 shares a fingerprint") {
    // two docs agreeing on exactly an 8-token run (= WinnowG+WinnowW-1)
    // embedded in otherwise disjoint text MUST land in text_winnow's
    // fingerprint intersection — the MOSS detection bound
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val doc1 = s"one two three four five six $run seven eight nine ten"
    val doc2 = s"red green blue cyan magenta $run yellow black white pink"
    import spark.implicits._
    val docs = Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")
    val gl = graft.functions.TextFunctions.ngrams(
      graft.functions.TextFunctions.tokens(col("text")), TextQueries.WinnowG)
    val hl = transform(gl, g => md5(g))
    val nw = size(hl) - (TextQueries.WinnowW - 1)
    val fps = docs.select(col("doc_id"), explode(
        array_distinct(transform(sequence(lit(1), nw),
          i => array_min(slice(hl, i, lit(TextQueries.WinnowW)))))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val f1 = fps.filter(_._1 == 1L).map(_._2).toSet
    val f2 = fps.filter(_._1 == 2L).map(_._2).toSet
    assert((f1 & f2).nonEmpty,
      s"8-token shared run produced no shared fingerprint (G=${TextQueries.WinnowG}, W=${TextQueries.WinnowW})")
  }

  test("winnowing samples: fingerprints per doc are a small fraction of grams") {
    val gl = graft.functions.TextFunctions.ngrams(
      graft.functions.TextFunctions.tokens(col("text")), TextQueries.WinnowG)
    val hl = transform(gl, g => md5(g))
    val nw = size(hl) - (TextQueries.WinnowW - 1)
    val row = Tables.documents(spark, sf)
      .select(size(hl).as("n_grams"), size(array_distinct(transform(
        sequence(lit(1), greatest(nw, lit(0))),
        i => array_min(slice(hl, i, lit(TextQueries.WinnowW)))))).as("n_fp"))
      .agg(sum(col("n_grams")).as("g"), sum(col("n_fp")).as("f"))
      .head()
    val (g, f) = (row.getLong(0), row.getLong(1))
    // expected density ~ 2/(W+1) = 1/3 of grams; assert the sampling
    // is real (< 1/2) and non-degenerate (> 1/20)
    assert(f * 2 < g, s"winnow kept $f of $g grams — not sampling")
    assert(f * 20 > g, s"winnow kept $f of $g grams — implausibly sparse")
  }

  test("CMS estimates never underestimate and stay inside the w-geometry error") {
    val est = EventQueries.queries("events_cms_counts")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf).groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (u, e) =>
      assert(e >= exact(u), s"user $u: CMS $e underestimates exact ${exact(u)}")
    }
    val n = exact.values.sum.toDouble
    val meanErr = est.map { case (u, e) => e - exact(u) }.sum.toDouble / est.size
    // expected collision mass per counter ~ N/w; the min over d=4 rows
    // sits well under it — 2N/w fails loudly on misrouted buckets
    assert(meanErr <= 2.0 * n / EventQueries.CmsW,
      s"mean CMS overestimate $meanErr vs bound ${2.0 * n / EventQueries.CmsW}")
  }

  test("CMS join-size estimate never underestimates the exact join size") {
    val est = EventQueries.queries("events_join_size_est")(spark, sf)
      .head().getLong(2)
    val e = Tables.events(spark, sf)
    def counts(t: String) = e.filter(col("event_type") === t)
      .groupBy(col("user_id")).count()
    val exact = counts(EventQueries.JoinEstTypeA).as("a")
      .join(counts(EventQueries.JoinEstTypeB).as("b"), "user_id")
      .select(sum(col("a.count") * col("b.count")).as("n"))
      .head().getLong(0)
    assert(est >= exact, s"CMS inner product $est underestimates exact $exact")
    // E[est] = exact + nA*nB/w (the collision mass is ADDITIVE and
    // dominates when distinct keys >> w); 3x that mass fails loudly
    // on misrouted buckets while tolerating the geometry
    val nA = e.filter(col("event_type") === EventQueries.JoinEstTypeA).count()
    val nB = e.filter(col("event_type") === EventQueries.JoinEstTypeB).count()
    val bound = exact + 3 * nA * nB / EventQueries.CmsW
    assert(est <= bound, s"CMS inner product $est vs bound $bound — misrouted?")
  }

  test("MG candidate set from the corpus sketch covers every true heavy hitter") {
    import spark.implicits._
    val toks = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
    val cands = toks.as[String]
      .select(new graft.functions.MisraGriesAgg(TextQueries.HhK).toColumn)
      .head().map(_._1).toSet
    val counts = toks.groupBy(col("token")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val n = counts.map(_._2).sum
    val truth = counts.filter { case (_, c) => c * (TextQueries.HhK + 1) > n }
      .map(_._1).toSet
    assert(truth.subsetOf(cands),
      s"MG no-miss bound violated: ${truth -- cands} above N/(k+1) but not in sketch")
    assert(truth.nonEmpty, "threshold produced an empty heavy-hitter set — vacuous")
  }

  test("quantile sketch lands within one bin width of the exact rank value") {
    val est = EventQueries.queries("events_quantile_sketch")(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val vals = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(est.keySet.map(_._1) == vals.keySet)
    assert(est.keySet.map(_._2) == EventQueries.QhPcts.toSet,
      "every percentile target must resolve to exactly one covering bin")
    est.foreach { case ((t, p), (n, target, e)) =>
      assert(n == vals(t).length, s"($t,$p): sketch n $n vs corpus ${vals(t).length}")
      val exact = vals(t)((target - 1).toInt)
      // est and the rank-target value lie in the same bin, so the
      // estimate can never be off by more than the bin width — the
      // histogram analogue of KLL/t-digest's rank-error guarantee
      assert(math.abs(e - exact) <= EventQueries.QhWidth,
        s"($t,$p): est $e vs exact rank value $exact beyond one bin width")
    }
    assert(est.values.exists { case (_, _, e) =>
      e / EventQueries.QhWidth != math.floor(e / EventQueries.QhWidth) },
      "no estimate interpolated inside a bin — the IEEE-interpolation path is vacuous")
  }

  test("fixed-width histogram bins stay inside [0, 250) — the bounded-state contract") {
    // ADVICE r13: the "≤ 250 counters per group" claim relied on the
    // fixture's [0, 1000) value domain without enforcement — an
    // out-of-domain value would silently create extra bins (negative
    // values a negative bin). Pin the contract so a fixture change
    // fails loudly here instead of quietly growing state.
    val bins = Tables.events(spark, sf)
      .select(floor(col("value") / lit(EventQueries.QhWidth)).cast("long").as("b"))
      .agg(min(col("b")).as("lo"), max(col("b")).as("hi")).head()
    assert(bins.getLong(0) >= 0L && bins.getLong(1) < 250L,
      s"observed bin range [${bins.getLong(0)}, ${bins.getLong(1)}] outside [0, 250)")
  }

  test("adaptive quantile sketch: bounded bins by construction, error ≤ per-type width") {
    val est = EventQueries.queries("events_quantile_adaptive")(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val vals = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(est.keySet.map(_._1) == vals.keySet)
    assert(est.keySet.map(_._2) == EventQueries.QhPcts.toSet,
      "every percentile target must resolve to exactly one covering bin")
    est.foreach { case ((t, p), (n, target, e)) =>
      assert(n == vals(t).length, s"($t,$p): sketch n $n vs corpus ${vals(t).length}")
      val vs = vals(t)
      val width = if (vs.head == vs.last) 1.0
        else (vs.last - vs.head) / EventQueries.QaBins
      val exact = vs((target - 1).toInt)
      assert(math.abs(e - exact) <= width,
        s"($t,$p): est $e vs exact rank value $exact beyond one adaptive width $width")
      // no domain assumption: every estimate lies inside the observed
      // [min, max] span (the clamp keeps bin 249 from overshooting)
      assert(e >= vs.head - 1e-9 && e <= vs.last + width + 1e-9,
        s"($t,$p): est $e escapes the observed span [${vs.head}, ${vs.last}]")
    }
  }

  test("histogram cells merge by addition (union-of-parts = cells-of-whole)") {
    def cells(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type"),
        floor(col("value") / lit(EventQueries.QhWidth)).cast("long").as("b"))
      .groupBy(col("event_type"), col("b")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val e = Tables.events(spark, sf)
    val whole = cells(e)
    val even = cells(e.filter(col("event_id") % 2 === 0))
    val odd = cells(e.filter(col("event_id") % 2 =!= 0))
    val merged = (even.keySet ++ odd.keySet).map(k =>
      k -> (even.getOrElse(k, 0L) + odd.getOrElse(k, 0L))).toMap
    assert(merged == whole,
      "adding per-shard histogram counters must reproduce the whole-corpus cells")
    assert(even.nonEmpty && odd.nonEmpty, "one shard empty — merge check vacuous")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the late-round-10 analytics/curation additions,
  * asserted structurally against independent recomputation (the
  * value-level check is the DuckDB oracle): merge op tags partition
  * the key space correctly, rolling sums equal a brute-force trailing
  * recompute, trending ranks are genuine per-window top-3, weighted
  * sampling keeps exactly the hash-under-rate docs, and the LM score
  * is consistent (known ≤ total, mass positive iff known > 0).
  */
class AnalyticsOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("events_merge_upsert op tags partition the key space; values are the delta-or-base last write") {
    val rows = SparkEntry.queries("events_merge_upsert")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ops = rows.groupBy(_.getAs[String]("op")).view.mapValues(_.length).toMap
    // all three branches must be live in the fixture
    assert(ops.keySet == Set("update", "insert", "keep"), s"got $ops")
    // keys are unique after the merge
    val keys = rows.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("k")))
    assert(keys.distinct.length == keys.length)
  }

  test("events_rolling_value equals a brute-force trailing recompute") {
    val got = SparkEntry.queries("events_rolling_value")(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
        (r.getAs[Long]("t_ms"), r.getAs[Long]("n_trail"), r.getAs[Double]("v_trail")))
      .toMap
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("t_ms"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byUser = evs.groupBy(_._1)
    evs.foreach { case (u, eid, t, _) =>
      val frame = byUser(u).filter(e => e._3 >= t - 3600000L && e._3 <= t)
      val (gt, gn, gv) = got((u, eid))
      assert(gt == t && gn == frame.length)
      // decimal(18,4) sum of the frame set, order-free
      val want = frame.map(e => BigDecimal(e._4).setScale(4, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      assert(gv == want, s"user $u event $eid")
    }
  }

  test("events_trending is the true per-window top-3 by recomputed counts") {
    val counts = Tables.events(spark, sf)
      .select(unix_millis(col("ts")).as("t_ms"), col("event_type")).collect()
      .map(r => ((r.getLong(0) / 21600000L) * 21600000L, r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = SparkEntry.queries("events_trending")(spark, sf).collect()
    assert(got.nonEmpty)
    got.groupBy(_.getAs[Long]("w_start_ms")).foreach { case (w, rows) =>
      assert(rows.length <= 3)
      val want = counts.collect { case ((ww, t), c) if ww == w => (t, c) }.toSeq
        .sortBy { case (t, c) => (-c, t) }.take(rows.length)
      val gotRanked = rows.sortBy(_.getAs[Int]("rnk"))
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("cnt")))
      assert(gotRanked.toSeq == want, s"window $w")
    }
  }

  test("text_weighted_sample keeps exactly the docs whose salted hash is under their own rate") {
    val kept = SparkEntry.queries("text_weighted_sample")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("rate_pct")).toMap
    assert(kept.nonEmpty && kept.size < 500, "sampling must neither drop nor keep everything")
    // recompute rate and hash-keep decision per doc through the engine's own columns
    val all = Tables.documents(spark, sf)
      .select(col("doc_id"),
        least(lit(95), greatest(lit(10),
          graft.functions.TextFunctions.tokenCount(col("text")))).as("rate"),
        (graft.functions.TextFunctions.tokenHash(
          concat(col("doc_id").cast("string"), lit(":wsamp"))) % 100).as("mh"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    all.foreach { case (id, rate, mh) =>
      assert(kept.contains(id) == (mh < rate), s"doc $id")
      if (kept.contains(id)) assert(kept(id) == rate)
    }
  }

  test("text_lm_score counts are consistent and the vocabulary cut binds") {
    val rows = SparkEntry.queries("text_lm_score")(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    var anyUnknown = false
    rows.foreach { r =>
      val n = r.getAs[Long]("n_bigrams")
      val known = r.getAs[Long]("known_bigrams")
      val mass = r.getAs[Long]("familiarity_mass")
      assert(known >= 0 && known <= n)
      assert((mass > 0) == (known > 0))
      assert(mass >= known, "each known bigram contributes count >= 1")
      if (known < n) anyUnknown = true
    }
    // the top-K cut only bites once the corpus has more than LmVocab
    // distinct bigrams (true at sf0.01+; sf0.001 fits entirely)
    val distinctBigrams = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.bigrams(col("text"))).as("g"))
      .distinct().count()
    if (distinctBigrams > graft.queries.TextQueries.LmVocab)
      assert(anyUnknown, "top-K vocabulary must exclude some bigrams at this SF")
  }

  test("events_zorder tiles bound BOTH dimensions to the 8-wide rectangle") {
    val rows = SparkEntry.queries("events_zorder")(spark, sf).collect()
    assert(rows.nonEmpty)
    var total = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("max_user") - r.getAs[Long]("min_user") <= 7)
      assert(r.getAs[Long]("max_day") - r.getAs[Long]("min_day") <= 7)
      total += r.getAs[Long]("n_rows")
    }
    assert(total == Tables.events(spark, sf).count(), "tiles partition the table")
  }

  test("events_ewma equals a driver-side sequential fold") {
    val got = SparkEntry.queries("events_ewma")(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("ewma_r")).toMap
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_millis(col("ts")).as("t_ms"),
        col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    evs.groupBy(_._1).foreach { case (u, rows) =>
      val ordered = rows.sortBy(e => (e._2, e._3)).map(_._4)
      val want = ordered.tail.foldLeft(ordered.head)((s, x) => s + 0.25d * (x - s))
      assert(got(u) == math.rint(want * 1e6) / 1e6 ||
        got(u) == BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"user $u")
    }
  }

  test("events_anomaly flags exactly the > 1.5-sigma events of a brute-force recompute") {
    val got = SparkEntry.queries("events_anomaly")(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"))).toSet
    assert(got.nonEmpty)
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // .toSeq before flatMap: flatMapping a Map with a pair-valued
    // function rebuilds a Map keyed by user — one event per user
    val want = evs.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val n = rows.length
      val s1 = rows.map(e => BigDecimal(e._3).setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val s2 = rows.map(e => BigDecimal(e._3 * e._3).setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val mean = s1 / n
      val std = math.sqrt(math.max(s2 / n - mean * mean, 0.0))
      if (std > 0.0)
        rows.toSeq.filter(e => math.abs(e._3 - mean) > 1.5 * std).map(e => (u, e._2))
      else Seq.empty[(Long, Long)]
    }.toSet
    assert(got == want)
  }

  test("dedup_containment reports genuinely asymmetric pairs Jaccard would miss") {
    val rows = SparkEntry.queries("dedup_containment")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getAs[Double]("c_ab_r"); val b = r.getAs[Double]("c_ba_r")
      assert(a >= 0 && a <= 1 && b >= 0 && b <= 1)
      assert(math.max(a, b) >= 0.7 - 1e-9)
    }
    assert(rows.exists { r =>
      math.min(r.getAs[Double]("c_ab_r"), r.getAs[Double]("c_ba_r")) < 0.5
    }, "at least one asymmetric (subset-like) pair must exist in the fixture")
  }

  test("text_line_dedup keeps first occurrences only and the fixture bites") {
    val rows = SparkEntry.queries("text_line_dedup")(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Int]("n_unique") <= r.getAs[Int]("n_lines"))
    }
    assert(rows.exists(r => r.getAs[Int]("n_unique") < r.getAs[Int]("n_lines")),
      "some doc must contain an intra-doc repeated line")
  }

  test("text_budget_select equals the brute-force maximal quality-ordered prefix") {
    // sf0.01: the budget must BITE (sf0.001's whole corpus fits under it)
    val sf01 = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("text_budget_select")(spark, sf01).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("cum_tokens"))).sortBy(_._1)
    val docs = Tables.documents(spark, sf01).select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n"),
        graft.functions.TextFunctions.stopwordRatio(col("text")).as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy { case (id, _, q) => (-q, id) }
    val cums = docs.scanLeft(0L)(_ + _._2).tail
    val want = docs.zip(cums).takeWhile(_._2 <= graft.queries.TextQueries.SelectBudget)
      .map { case ((id, n, _), c) => (id, n, c) }.sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    assert(want.nonEmpty && cums.last > graft.queries.TextQueries.SelectBudget,
      "fixture budget cut does not bite")
  }

  test("text_dup_spans equals a brute-force cross-doc shared-gram count") {
    val n = graft.queries.TextQueries.DupSpanN
    val got = SparkEntry.queries("text_dup_spans")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_dup"))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").filter(_.nonEmpty)))
    val grams = docs.map { case (id, t) => id -> t.sliding(n, 1).filter(_.length == n)
      .map(_.mkString(" ")).toSeq }
    val docsByGram = grams.flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    grams.filter(_._2.nonEmpty).foreach { case (id, gs) =>
      val dup = gs.count(g => docsByGram(g) >= 2)
      assert(got(id) == ((gs.size.toLong, dup.toLong)), s"doc $id")
    }
    assert(got.values.exists(_._2 > 0), "fixture shares no spans — vacuous")
  }

  test("events_cum_users curves are monotone and end at the true distinct counts") {
    val rows = SparkEntry.queries("events_cum_users")(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day"),
        r.getAs[Long]("n_new"), r.getAs[Long]("cum_users")))
    val byType = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    byType.foreach { case (t, rs) =>
      // cum is the running sum of n_new, hence strictly increasing
      assert(rs.map(_._3).scanLeft(0L)(_ + _).tail.sameElements(rs.map(_._4)), t)
    }
    val want = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.view.mapValues(_.last._4).toMap == want,
      "final cumulative != true distinct user count")
  }

  test("embedding_classify confusion matrix is consistent and beats chance") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("embedding_classify")(spark, sf01).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Int]("pred_label"), r.getAs[Long]("n")))
    val rowSums = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val want = Tables.embeddings(spark, sf01).groupBy(col("label")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rowSums == want, "matrix row sums != label counts")
    val total = rows.map(_._3).sum
    val diag = rows.filter(r => r._1 == r._2).map(_._3).sum
    // 10 balanced labels → chance ≈ 10%; the centroid classifier must
    // demonstrate the labels are geometrically real (measured ~41%)
    assert(diag.toDouble / total > 0.25, s"accuracy ${diag.toDouble / total}")
  }

  test("events_markov: transitions account for every non-first event; probabilities sum to 1") {
    val rows = SparkEntry.queries("events_markov")(spark, sf).collect()
      .map(r => (r.getAs[String]("prev_type"), r.getAs[String]("event_type"),
        r.getAs[Long]("n"), r.getAs[Double]("p_r")))
    val nEvents = Tables.events(spark, sf).count()
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_._3).sum == nEvents - nUsers, "every event after a user's first transitions")
    rows.groupBy(_._1).foreach { case (p, rs) =>
      val ps = rs.map(_._4).sum
      assert(math.abs(ps - 1.0) < 1e-4, s"$p rows sum to $ps")
    }
  }

  test("events_paths partitions the user base; q20 supports are real co-occurrence counts") {
    val paths = SparkEntry.queries("events_paths")(spark, sf).collect()
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(paths.map(_.getAs[Long]("n_users")).sum == nUsers)
    val basket = SparkEntry.queries("q20_market_basket")(spark, sf).collect()
      .map(r => (r.getAs[Long]("pa"), r.getAs[Long]("pb"), r.getAs[Long]("support")))
    val orders = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    basket.foreach { case (pa, pb, sup) =>
      assert(pa < pb)
      val want = orders.values.count(s => s.contains(pa) && s.contains(pb))
      assert(sup == want, s"pair ($pa,$pb)")
    }
  }

  test("multimodal augmentation: flip is an involution, rot90 four times is identity") {
    import graft.multimodal.Multimodal.PgmCodec
    // a crafted asymmetric image: transforms must actually move pixels
    val px = Array.tabulate(12)(i => (i * 17 + 3).toByte)
    val img = PgmCodec.encode(px, 4, 3)
    def decode(p: Array[Byte]) = (PgmCodec.decodeImage(p), PgmCodec.pixels(p))
    def flip(p: Array[Byte]): Array[Byte] = {
      val ((w, h, _), b) = decode(p)
      PgmCodec.encode(Array.tabulate(b.length)(i => b((i / w) * w + (w - 1 - i % w))), w, h)
    }
    def rot(p: Array[Byte]): Array[Byte] = {
      val ((w, h, _), b) = decode(p)
      PgmCodec.encode(Array.tabulate(b.length)(i => b((h - 1 - i % h) * w + i / h)), h, w)
    }
    assert(!flip(img).sameElements(img), "flip must move pixels")
    assert(flip(flip(img)).sameElements(img), "flip ∘ flip != id")
    assert(rot(rot(rot(rot(img)))).sameElements(img), "rot90⁴ != id")
    // and rot90 twice = flip both axes (180°), not a flip
    assert(!rot(rot(img)).sameElements(flip(img)))
  }

  test("q19_record_linkage links every dirty variant back to its source at distance 1") {
    val rows = SparkEntry.queries("q19_record_linkage")(spark, sf).collect()
      .map(r => (r.getAs[String]("name"), r.getAs[String]("dirty"), r.getAs[Int]("dist")))
    val names = Tables.part(spark, sf).select(col("p_name")).distinct()
      .collect().map(_.getString(0))
    names.foreach { n =>
      val w = n.split(" ")
      val dirty = s"${w(0)} ${w(1).charAt(0)}${w(1).drop(2)}"
      assert(rows.contains((n, dirty, 1)), s"missing identity link for '$n'")
    }
    assert(rows.forall(_._3 <= 2))
  }

  test("events_resample_ffill matches a per-user driver-side fill") {
    val got = SparkEntry.queries("events_resample_ffill")(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day")) ->
        (r.getAs[Long]("n_events"), Option(r.get(r.fieldIndex("v_ffill_r")))))
      .toMap
    val users = got.keys.map(_._1).toSeq.distinct
    val days = got.keys.map(_._2)
    assert(got.size == users.size * (days.max - days.min + 1), "grid not dense")
    users.foreach { u =>
      var lastV: Option[Any] = None
      (days.min to days.max).foreach { d =>
        val (n, v) = got((u, d))
        if (n == 0) assert(v == lastV, s"user $u day $d: fill broke")
        else { assert(v.isDefined); lastV = v }
      }
    }
  }

  test("dedup_hop_distance: zero iff canonical, and a hop-h node has a hop-(h-1) neighbor") {
    val rows = SparkEntry.queries("dedup_hop_distance")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("component"), r.getAs[Int]("hops")))
    rows.foreach { case (id, comp, h) =>
      assert((h == 0) == (id == comp), s"doc $id")
    }
    val hops = rows.map(r => r._1 -> r._3).toMap
    val edges = graft.queries.DedupQueries.minhashVerifiedPairs(spark, sf)
      .select(col("doc_a"), col("doc_b")).collect()
      .flatMap(r => Seq(r.getLong(0) -> r.getLong(1), r.getLong(1) -> r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.filter(_._3 > 0).foreach { case (id, _, h) =>
      assert(edges(id).exists(n => hops(n) == h - 1), s"doc $id has no hop-${h - 1} neighbor")
    }
  }

  test("text_bpe_train merges are the true argmax pairs, in order") {
    val rows = SparkEntry.queries("text_bpe_train")(spark, sf).collect()
      .map(r => (r.getAs[String]("step"), r.getAs[String]("item"), r.getAs[Long]("n")))
    val m1 = rows.find(_._1 == "merge1").get
    val m2 = rows.find(_._1 == "merge2").get
    // brute-force round-1 pair counts off the raw corpus
    val words = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .collect().map(_.getString(0))
    val freq = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val p1 = freq.toSeq.flatMap { case (w, f) =>
      w.toSeq.sliding(2).filter(_.length == 2)
        .map(p => s"${p(0)} ${p(1)}" -> f)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val want1 = p1.toSeq.minBy { case (g, n) => (-n, g) }
    assert((m1._2, m1._3) == want1, s"merge1 $m1 vs $want1")
    // the adopted merge strictly reduces availability of its pair:
    // round 2's winner count can never exceed round 1's
    assert(m2._3 <= m1._3)
    // merged-state tokens carry no separator
    assert(rows.filter(_._1 == "token").forall(!_._2.contains(" ")))
  }

  test("dedup_semantic: drops have a kept-or-dropped lower-id witness; cells partition the corpus") {
    val rows = SparkEntry.queries("dedup_semantic")(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(rows.length == n, "one verdict per vector")
    val dropped = rows.count(_.getAs[Int]("is_kept") == 0)
    assert(dropped > 0 && dropped < n, "threshold must discriminate at this SF")
    // lowest id within each cell can never be dropped (no lower-id witness)
    rows.groupBy(_.getAs[Int]("cell")).foreach { case (_, members) =>
      val minId = members.map(_.getAs[Long]("vec_id")).min
      val minRow = members.find(_.getAs[Long]("vec_id") == minId).get
      assert(minRow.getAs[Int]("is_kept") == 1)
    }
  }

  test("events_attribution_position: credits conserve per conversion; model branches live") {
    import org.apache.spark.sql.expressions.Window
    val rows = SparkEntry.queries("events_attribution_position")(spark, sf).collect()
    assert(rows.nonEmpty)
    // re-derive the pairing and per-touch credits independently
    val e = Tables.events(spark, sf)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val t = e.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("event_id").as("t_id"),
        col("event_type").as("channel"), col("ts").as("t_ts"))
    val paired = t.join(p, Seq("user_id"))
      .filter(col("t_ts") <= col("p_ts") &&
        col("t_ts") > col("p_ts") - expr("INTERVAL 24 HOURS"))
      .withColumn("k", row_number().over(
        Window.partitionBy(col("user_id"), col("p_id"))
          .orderBy(col("t_ts"), col("t_id"))))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("user_id"), col("p_id"))))
      .select(col("channel"), col("p_id"), col("k"), col("n")).collect()
    val ns = paired.map(_.getAs[Long]("n")).toSet
    assert(ns.contains(1L) && ns.contains(2L) && ns.exists(_ >= 3L),
      s"sole/pair/U-shaped branches must all be live, got n values $ns")
    def credit(k: Long, n: Long): Double =
      if (n == 1) 1.0 else if (n == 2) 0.5
      else if (k == 1 || k == n) 0.4 else 0.2 / (n - 2)
    val brute = paired.groupBy(_.getAs[String]("channel")).view.mapValues(
      _.map(r => BigDecimal(credit(r.getAs[Int]("k").toLong, r.getAs[Long]("n")))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble).toMap
    rows.foreach { r =>
      val c = r.getAs[String]("channel")
      assert(math.abs(r.getAs[Double]("credit_sum") - brute(c)) <= 1e-9,
        s"$c: entry ${r.getAs[Double]("credit_sum")} vs brute ${brute(c)}")
    }
    // conservation: each conversion's credits sum to 1 (up to the 1e-4
    // per-credit quantization of the DECIMAL summation convention)
    val nConv = paired.map(_.getAs[Long]("p_id")).distinct.length
    val totalCredit = rows.map(_.getAs[Double]("credit_sum")).sum
    assert(math.abs(totalCredit - nConv) <= 1e-4 * paired.length,
      s"credit mass $totalCredit vs $nConv attributed conversions")
  }

  test("events_k_anon: ladder branches live, corpus conserved, per-row rederivation agrees") {
    import graft.queries.EventQueries
    import org.apache.spark.sql.expressions.Window
    val summary = SparkEntry.queries("events_k_anon")(spark, sf).collect()
    assert(summary.map(_.getAs[String]("level")).toSet ==
      Set("day_band", "band", "suppressed"),
      "all three generalization-ladder branches must be live in the fixture")
    val total = Tables.events(spark, sf).count()
    assert(summary.map(_.getAs[Long]("rows_pub")).sum == total,
      "published + generalized + suppressed must partition the corpus")
    // independent per-row derivation (window counts instead of the
    // entry's aggregate pipeline) must land every row on the same level
    val e = Tables.events(spark, sf).select(col("event_type"),
      to_date(col("ts")).as("d"),
      floor(col("value") / lit(EventQueries.KAnonBand)).cast("long").as("b"))
    val perRow = e
      .withColumn("c0", count(lit(1)).over(
        Window.partitionBy(col("event_type"), col("d"), col("b"))))
      .withColumn("rc", count(when(col("c0") < EventQueries.KAnonK, 1)).over(
        Window.partitionBy(col("event_type"), col("b"))))
      .withColumn("lvl",
        when(col("c0") >= EventQueries.KAnonK, "day_band")
          .when(col("rc") >= EventQueries.KAnonK, "band")
          .otherwise("suppressed"))
      .groupBy(col("event_type"), col("lvl")).count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val fromEntry = summary
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("level")) ->
        r.getAs[Long]("rows_pub")).toMap
    assert(perRow == fromEntry,
      s"per-row ladder assignment disagrees with the entry: $perRow vs $fromEntry")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the BM25 / temperature-mixture / SCD2 / compaction-
  * planning additions, asserted against independent driver-side
  * recomputation (value-level equality is the DuckDB oracle's job):
  * BM25 equals a brute-force rescore under the same op order, the
  * temperature rate is the C/√p formula and favors rare sources, SCD2
  * intervals tile each user's timeline exactly at its state changes,
  * and compaction bins are the exact cumulative-sum packing.
  */
class LakehouseRetrievalOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def toks(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  test("text_bm25 equals a brute-force rescore; boolean-AND hits are exactly the n_terms=3 docs") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> toks(r.getString(1))).toMap
    val n = docs.size
    val avgdl = docs.valuesIterator.map(_.length.toLong).sum.toDouble / n
    val terms = queries.TextQueries.SearchTerms
    val df = terms.map(t => t -> docs.valuesIterator.count(_.contains(t))).toMap
    val want = docs.flatMap { case (id, tk) =>
      val dl = tk.length
      val present = terms.filter(tk.contains(_))
      if (present.isEmpty) None
      else {
        // literal mirror of the query's op order, summed in term order
        val score = terms.map { t =>
          val tf = tk.count(_ == t)
          if (tf == 0) 0.0
          else {
            val idf = (n.toDouble - df(t).toDouble + 0.5) / (df(t).toDouble + 0.5)
            idf * (tf.toDouble * 2.2 /
              (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl))))
          }
        }.reduceLeft(_ + _)
        Some(id -> (present.size.toLong,
          BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }
    val got = SparkEntry.queries("text_bm25")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_terms"), r.getAs[Double]("score_r"))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (nt, sc)) =>
      assert((nt, sc) == want(id), s"doc $id: got ($nt, $sc), want ${want(id)}")
    }
    val andHits = SparkEntry.queries("text_search_boolean")(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got.filter(_._2._1 == 3).keySet == andHits,
      "BM25 n_terms=3 docs must be exactly the boolean-AND result")
  }

  test("text_mixture_temperature rates follow C/sqrt(p) and favor rare sources") {
    val counts = Tables.documents(spark, sf)
      .groupBy(col("source")).agg(count(lit(1)).as("cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    val kept = SparkEntry.queries("text_mixture_temperature")(spark, sf).collect()
    assert(kept.nonEmpty)
    val rateBySrc = kept.map(r =>
      r.getAs[String]("source") -> r.getAs[Int]("rate_pct")).toMap
    rateBySrc.foreach { case (src, rate) =>
      val want = math.min(100L,
        math.floor(queries.TextQueries.TempSampleC /
          math.sqrt(counts(src).toDouble / n)).toLong)
      assert(rate.toLong == want, s"$src: rate $rate != $want")
    }
    // monotone: a strictly larger source never gets a strictly larger rate
    for {
      (s1, r1) <- rateBySrc; (s2, r2) <- rateBySrc
      if counts(s1) < counts(s2)
    } assert(r1 >= r2, s"rarer $s1 (rate $r1) must be >= $s2 (rate $r2)")
  }

  test("events_scd2 intervals tile each user's timeline at exactly its state changes") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("t_ms"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val gotByUser = SparkEntry.queries("events_scd2")(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("version"),
        r.getAs[String]("state"), r.getAs[Long]("valid_from_ms"),
        Option(r.getAs[java.lang.Long]("valid_to_ms")).map(_.longValue)))
      .groupBy(_._1)
    evs.groupBy(_._1).foreach { case (u, rows) =>
      val ordered = rows.sortBy(e => (e._3, e._2)).map(e => (e._3, e._4))
      // brute-force change points: first event + every state switch
      val changes = ordered.foldLeft(Vector.empty[(Long, String)]) {
        case (acc, (t, st)) =>
          if (acc.lastOption.forall(_._2 != st)) acc :+ (t -> st) else acc
      }
      val got = gotByUser(u).sortBy(_._2)
      assert(got.map(_._2).toSeq == (1 to changes.size), s"user $u versions")
      got.zip(changes).foreach { case ((_, _, st, from, _), (ct, cst)) =>
        assert(st == cst && from == ct, s"user $u")
      }
      // intervals tile: each valid_to is the NEXT version's valid_from;
      // only the last stays open
      got.sliding(2).foreach { pair =>
        if (pair.length == 2)
          assert(pair(0)._5.contains(pair(1)._4), s"user $u gap")
      }
      assert(got.last._5.isEmpty && got.init.forall(_._5.nonEmpty), s"user $u open")
    }
  }

  test("events_debounce equals the brute-force greedy throttle") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("t_ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = evs.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      var last = Long.MinValue
      var first = true
      rows.sortBy(e => (e._3, e._2)).flatMap { case (_, id, t) =>
        if (first || t - last >= queries.EventQueries.DebounceMs) {
          first = false; last = t; Some(u -> id)
        } else None
      }
    }.toSet
    val got = SparkEntry.queries("events_debounce")(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("event_id")).toSet
    assert(got == want)
    assert(got.size < evs.length, "drops must fire")
  }

  test("events_scd2_lookup enriches every event exactly once with its change-point state") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("t_ms"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val got = SparkEntry.queries("events_scd2_lookup")(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[String]("state"), r.getAs[Int]("version"))).toMap
    assert(got.size == evs.length, "exactly one dimension match per event")
    // the looked-up state must be the event's own type: an event IS
    // the latest change at-or-before its own timestamp
    evs.foreach { case (_, eid, _, tpe) =>
      assert(got(eid)._1 == tpe, s"event $eid state")
    }
  }

  // value-level argmax is the DuckDB oracle's check (exact integer
  // scores); this spec pins the structural contract
  test("multimodal_caption_match pairs stay in their source block and cover every image") {
    val rows = SparkEntry.queries("multimodal_caption_match")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val capsBySource = docs.toSeq
      .collect { case (id, src) if id % 3 == 1 => src -> id }
      .groupBy(_._1).view.mapValues(_.size).toMap
    rows.foreach { r =>
      val img = r.getAs[Long]("media_id")
      val cap = r.getAs[Long]("caption_id")
      assert(img % 3 == 0 && cap % 3 == 1, "kinds")
      assert(docs(img) == docs(cap), "pair must share its source block")
      assert(r.getAs[Long]("n_cands") == capsBySource(docs(img)).toLong)
    }
    // one row per image that has any caption candidate
    val imgsWithCaps = docs.collect {
      case (id, src) if id % 3 == 0 && capsBySource.contains(src) => id
    }
    assert(rows.map(_.getAs[Long]("media_id")).toSet == imgsWithCaps.toSet)
  }

  test("embedding_gram equals the brute-force outer-product sum") {
    val codes = SparkEntry.queries("embedding_quantize")(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("lane"), r.getAs[Int]("code")))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val dim = codes.head._2.length
    val want = (for { i <- 0 until dim; j <- i until dim } yield
      (i, j) -> codes.valuesIterator
        .map(c => c(i).toLong * c(j)).sum).toMap
    val got = SparkEntry.queries("embedding_gram")(spark, sf).collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) -> r.getAs[Long]("g")).toMap
    assert(got == want)
    // diagonal entries are sums of squares
    (0 until dim).foreach(i => assert(got((i, i)) >= 0L))
  }

  test("docs_time_travel: as-of-2 state has no v3 inserts, applies v2 edits, honors tombstones") {
    val ids = Tables.documents(spark, sf).select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    val got = SparkEntry.queries("docs_time_travel")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("version"), r.getAs[String]("op"))).toMap
    assert(got.keySet.forall(_ < 1000000L), "v3 inserts must be invisible at as-of 2")
    ids.foreach { id =>
      val deleted = id % 97 == 0
      val updated = id % 101 == 0
      if (deleted && !updated) assert(!got.contains(id), s"doc $id tombstoned")
      else {
        assert(got.contains(id), s"doc $id must survive")
        val wantV = if (updated) 2L else 1L
        assert(got(id)._1 == wantV, s"doc $id version")
      }
    }
  }

  test("taxi_od_matrix equals the brute-force pairing over the fixture math") {
    // driver mirror of ridesSql's derivation (same double op sequence)
    val legs = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id")).collect()
      .map { r =>
        val id = r.getLong(0); val u = r.getLong(1)
        val lon = -74.05 + (u % 360) * 0.001
        val lat = 40.5 + (id % 520) * 0.001
        (id, id % 2 == 0, lon, lat, (id % 4 + 1).toInt)
      }
      .filter { case (_, _, lon, lat, _) =>
        lon >= -74.05 && lon <= -73.7 && lat >= 40.5 && lat <= 41.0 }
    def cell(lon: Double, lat: Double): Int =
      (math.floor((74.05 - math.abs(lon)) / 0.0014) +
        math.floor((41.0 - lat) / 0.00125) * 250).toInt
    val byPair = legs.groupBy(_._1 / 2)
    val want = byPair.values.toSeq.flatMap { ls =>
      for {
        s <- ls.find(_._2); e <- ls.find(!_._2)
      } yield ((cell(s._3, s._4), cell(e._3, e._4)), e._5.toLong)
    }.groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val got = SparkEntry.queries("taxi_od_matrix")(spark, sf).collect()
      .map(r => (r.getAs[Int]("o_cell"), r.getAs[Int]("d_cell")) ->
        (r.getAs[Long]("n_trips"), r.getAs[Long]("pax"))).toMap
    assert(got == want)
  }

  test("events_quota keeps exactly the first K per user-day and reports true drop counts") {
    val K = queries.EventQueries.QuotaDaily
    val byDay = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("t_ms"))
      .collect()
      .map { r =>
        val t = r.getLong(2)
        ((r.getLong(0), (t - queries.EventQueries.RetentionEpochMs) / 86400000L),
          (t, r.getLong(1)))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(identity)).toMap
    val got = SparkEntry.queries("events_quota")(spark, sf).collect()
      .map(r => ((r.getAs[Long]("user_id"), r.getAs[Long]("day")),
        r.getAs[Long]("event_id"), r.getAs[Int]("rn"),
        r.getAs[Long]("n_dropped_day")))
    assert(got.nonEmpty && got.exists(_._4 > 0), "drops must fire")
    got.groupBy(_._1).foreach { case (key, rows) =>
      val evs = byDay(key)
      assert(rows.length == math.min(K, evs.length))
      val keptWant = evs.take(K).map(_._2).toSet
      assert(rows.map(_._2).toSet == keptWant, s"$key kept set")
      rows.foreach(r => assert(r._4 == (evs.length - math.min(K, evs.length)).toLong))
    }
  }

  test("q23_min_cost_supplier rows are exactly the per-part min-cost EU suppliers") {
    val rows = SparkEntry.queries("q23_min_cost_supplier")(spark, sf).collect()
    assert(rows.nonEmpty)
    val eu = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === queries.TpchQueries.MinCostRegion)
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val ps = Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice")).as("cost")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(t => eu.contains(t._2))
    val minByPart = ps.groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val want = ps.filter(t => t._3 == minByPart(t._1)).map(t => (t._1, t._2)).toSet
    assert(rows.map(r => (r.getAs[Long]("pk"), r.getAs[Long]("sk"))).toSet == want)
  }

  test("text_interleave positions are unique and full cycles round-robin every source") {
    val rows = SparkEntry.queries("text_interleave")(spark, sf).collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[String]("source")))
    assert(rows.map(_._1).distinct.length == rows.length, "positions must be unique")
    val counts = rows.groupBy(_._2).view.mapValues(_.size).toMap
    val nSrc = counts.size
    val minCnt = counts.values.min
    // while every source still has docs, positions are DENSE and each
    // cycle of nSrc serves every source exactly once — the round-robin
    // property the op exists for (tails of larger sources then
    // continue with gaps, preserving uniqueness)
    val dense = rows.filter(_._1 <= nSrc.toLong * minCnt).sortBy(_._1)
    assert(dense.length == nSrc * minCnt, "full cycles must be gapless")
    dense.grouped(nSrc).foreach { cycle =>
      assert(cycle.map(_._2).distinct.length == nSrc,
        s"cycle at ${cycle.head._1} does not span all sources")
    }
  }

  test("docs_compaction_bins is the exact cumulative-sum packing and covers every file") {
    val files = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val target = queries.StorageQueries.TargetBinBytes
    val want = files.groupBy(_._1).flatMap { case (src, fs) =>
      val sorted = fs.sortBy(_._2)
      val cums = sorted.scanLeft(0L)(_ + _._3).init // bytes BEFORE each file
      sorted.zip(cums).groupBy { case (_, before) => before / target }
        .map { case (bin, grp) =>
          (src, bin.toInt) -> (grp.length.toLong, grp.map(_._1._3).sum,
            grp.map(_._1._2).min, grp.map(_._1._2).max)
        }
    }
    val got = SparkEntry.queries("docs_compaction_bins")(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("bin")) ->
        (r.getAs[Long]("n_files"), r.getAs[Long]("bin_bytes"),
          r.getAs[Long]("first_id"), r.getAs[Long]("last_id"))).toMap
    assert(got == want)
    // coverage: file counts and bytes add back up to the corpus
    assert(got.values.map(_._1).sum == files.length)
    assert(got.values.map(_._2).sum == files.map(_._3).sum)
  }

  test("docs_manifest_prune: no false skips, effective pruning, disjoint file ranges") {
    import queries.StorageQueries
    val rows = SparkEntry.queries("docs_manifest_prune")(spark, sf).collect()
    // ≤, not ==: repartitionByRange samples its boundaries, so a small
    // or skewed fixture may leave a range empty (no part file written).
    // The HARD invariants are below — no false skips, additive hit
    // counts, disjoint ranges (ADVICE r13).
    assert(rows.length >= 1 && rows.length <= StorageQueries.ManifestFiles,
      s"expected 1..${StorageQueries.ManifestFiles} manifest files, got ${rows.length}")
    // the predicate recomputed independently over the raw corpus
    val maxId = Tables.documents(spark, sf).agg(max(col("doc_id")))
      .head().getLong(0)
    val lo = maxId * StorageQueries.ManifestLoPct / 100
    val hi = maxId * StorageQueries.ManifestHiPct / 100
    val exactSel = Tables.documents(spark, sf)
      .filter(col("doc_id").between(lo, hi)).count()
    assert(rows.map(_.getAs[Long]("sel_rows")).sum == exactSel,
      "per-file hit counts must add up to the full-scan predicate count")
    rows.foreach { r =>
      if (r.getAs[Long]("sel_rows") > 0)
        assert(r.getAs[Int]("must_read") == 1,
          s"false skip: ${r.getAs[String]("file_name")} holds hits but was pruned")
    }
    val mustRead = rows.count(_.getAs[Int]("must_read") == 1)
    assert(mustRead >= 1 && mustRead <= 2,
      s"range layout should confine a 10%-span predicate to 1-2 of 8 files, got $mustRead")
    // the property that MAKES stats pruning effective: disjoint ranges
    val spans = rows.map(r => (r.getAs[Long]("id_min"), r.getAs[Long]("id_max")))
      .sortBy(_._1)
    spans.sliding(2).foreach { case Array((_, aMax), (bMin, _)) =>
      assert(aMax < bMin, "range-clustered files must carry disjoint key ranges")
    }
  }

  test("an all-rejected WAP publish still writes a globbable schema-only parquet") {
    // docs_wap_publish's empty-publish guard (ADVICE r13) relies on
    // coalesce(1) producing at least one part file for a zero-row
    // write — pin that Spark behavior directly so a writer-path change
    // fails here, not as a DuckDB glob error inside the oracle run.
    val dir = java.nio.file.Files.createTempDirectory("graft-wap-empty-").toString
    try {
      Tables.documents(spark, sf).filter(lit(false)).coalesce(1)
        .write.mode("overwrite").parquet(dir)
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.nonEmpty,
        "zero-row coalesce(1) write produced no .parquet file — the oracle glob would error")
      val back = spark.read.parquet(dir)
      assert(back.count() == 0 && back.columns.contains("doc_id"),
        "schema-only read-back lost the schema")
    } finally {
      graft.streaming.TempDir.deleteRecursively(dir)
    }
  }

  test("docs_wap_publish: only the audited-clean batch ships; published files hold zero violations") {
    import queries.StorageQueries
    val rows = SparkEntry.queries("docs_wap_publish")(spark, sf).collect()
      .map(r => r.getAs[String]("batch") -> r).toMap
    assert(rows.keySet == Set("a", "b"))
    val total = Tables.documents(spark, sf).count()
    assert(rows("a").getAs[Long]("n_violations") == 0L)
    assert(rows("a").getAs[Int]("published") == 1)
    assert(rows("b").getAs[Int]("published") == 0)
    // the injected bug count is exactly the 1/13 slice
    val injected = Tables.documents(spark, sf)
      .filter(col("doc_id") % 13 === 0).count()
    assert(rows("b").getAs[Long]("n_violations") == injected && injected > 0)
    // the WAP guarantee, checked on the real published bytes: the
    // serving location holds exactly the clean batch and nothing that
    // would fail the audit
    val pub = spark.read.parquet(StorageQueries.WapPublishPath)
    assert(pub.count() == total)
    assert(rows("a").getAs[Long]("pub_rows") == total)
    assert(pub.filter(col("n_chars") =!= length(col("text"))).count() == 0,
      "published table must never expose a row the audit would reject")
    // rejected batch reports no published stats
    assert(rows("b").getAs[Long]("pub_rows") == 0L &&
      rows("b").getAs[Long]("pub_xor") == 0L)
  }
}

package graft

import graft.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The properties of the bloom prefilter the exact-result oracle
  * cannot see: the sketch admits EVERY true duplicate (no false
  * negatives — the property that keeps the composed result exact)
  * and rejects the bulk of non-duplicates (the bite that makes it a
  * prefilter, not a pass-through — a degenerate all-pass bloom would
  * leave the oracle green while silently shipping the whole delta to
  * the verify join).
  */
class BloomPrefilterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("bloom admits every true dup and rejects most non-dups") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .withColumn("h",
        graft.functions.TextFunctions.tokenHash(col("doc_id").cast("string")) % 100)
    val idx = docs.filter(col("h") < 90).select(md5(col("text")).as("digest"))
    val bloom = idx.stat.bloomFilter("digest", 2000L, 0.03)
    val idxSet = idx.as[String].collect().toSet
    val delta = docs.filter(col("h") >= 90)
      .select(col("doc_id"), md5(col("text")).as("digest"))
      .unionAll(docs.filter(col("h") < 90 && col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          md5(col("text")).as("digest")))
      .as[(Long, String)].collect()
    val (dups, nonDups) = delta.partition(t => idxSet.contains(t._2))
    assert(dups.nonEmpty, "seeded clones must make the dup branch fire")
    // no false negatives: every true dup passes the sketch
    assert(dups.forall(t => bloom.mightContainString(t._2)))
    // bite: the FP rate on true non-dups stays near the configured
    // 3% (generous bound — the point is it is nowhere near all-pass)
    val fpRate = nonDups.count(t => bloom.mightContainString(t._2)).toDouble /
      math.max(1, nonDups.length)
    assert(fpRate <= 0.2, s"bloom degenerated to pass-through (fp rate $fpRate)")
  }

  test("registered entry flags exactly the seeded clones (plus any natural dups)") {
    val out = SparkEntry.queries("dedup_bloom_prefilter")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val clones = out.keys.filter(_ >= 100000L)
    assert(clones.nonEmpty && clones.forall(out(_) == 1),
      "every re-identified index clone must be flagged as a duplicate")
  }
}

package graft

import graft.queries.TextQueries
import org.apache.spark.sql.execution.{SortExec, TakeOrderedAndProjectExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `text_priority_sample`'s two contracts beyond the oracle: the
  * selected set equals the brute-force full-order top-K (priority
  * sampling's definition), and the plan is the bounded selection —
  * TakeOrderedAndProject (per-partition top-K heaps + driver merge),
  * never a global sort-shuffle (the KMV k-min discipline).
  */
class PrioritySampleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("selection equals the brute-force full-order top-K") {
    import graft.functions.TextFunctions.tokenHash
    val all = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"),
        (col("n_chars").cast("double") /
          (tokenHash(concat(col("doc_id").cast("string"), lit(":prio"))) + lit(1L))
            .cast("double")).as("priority"))
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val expected = all.sortBy { case (id, p) => (-p, id) }
      .take(TextQueries.PrioK).map(_._1).toSet
    val got = TextQueries.queries("text_priority_sample")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got == expected, "priority sample drifted from the full-order top-K")
    assert(got.size == TextQueries.PrioK)
  }

  test("weighting is real: the sample over-represents long documents") {
    val sample = TextQueries.queries("text_priority_sample")(spark, sf)
      .agg(avg(col("n_chars"))).head.getDouble(0)
    val corpus = Tables.documents(spark, sf)
      .agg(avg(col("n_chars"))).head.getDouble(0)
    assert(sample > corpus,
      s"weighted sample mean n_chars $sample not above corpus mean $corpus")
  }

  test("plans as TakeOrderedAndProject — bounded top-K, no global sort") {
    val p = TextQueries.queries("text_priority_sample")(spark, sf)
      .queryExecution.executedPlan
    assert(p.collectFirst { case t: TakeOrderedAndProjectExec => t }.isDefined,
      s"expected TakeOrderedAndProject in:\n$p")
    assert(p.collect { case s: SortExec => s }.isEmpty,
      s"global sort leaked into the top-K plan:\n$p")
  }
}

package graft

import graft.streaming.TempDir
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Byte-fidelity pins for the XML interchange leg
  * (`docs_xml_roundtrip`). The entry's md5 checksum parity is only a
  * fidelity GATE if the reader options make fidelity possible — and
  * the XML source's DEFAULTS don't: `ignoreSurroundingSpaces` defaults
  * to true and silently trims leading/trailing whitespace from element
  * text. This spec pins (a) that the default really trims (so the
  * production entry's explicit `false` stays load-bearing — if a Spark
  * upgrade flips the default, the first assertion fails loudly instead
  * of the option silently becoming redundant), (b) that `false`
  * preserves padded text byte-exactly including tabs, and (c) the
  * empty-string-vs-null distinction round-trips (empty element vs
  * omitted element).
  */
class XmlFidelitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  private def roundtrip(ignoreSpaces: Boolean): Map[Long, String] = {
    import spark.implicits._
    val rows = Seq(
      (1L, "  leading"), (2L, "trailing  "), (3L, ""),
      (4L, null.asInstanceOf[String]), (5L, "\ttab  padded\t"),
      (6L, "inner  spaces"))
    val dir = TempDir.create("graft-xmlfid-")
    try {
      rows.toDF("id", "text").write.mode("overwrite")
        .option("rowTag", "doc").format("xml").save(dir.toString)
      spark.read.option("rowTag", "doc")
        .option("ignoreSurroundingSpaces", ignoreSpaces.toString)
        .schema(schema).format("xml").load(dir.toString)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    } finally TempDir.deleteRecursively(dir.toString)
  }

  test("default (trim) really trims — the explicit option stays load-bearing") {
    val got = roundtrip(ignoreSpaces = true)
    assert(got(1L) == "leading" && got(2L) == "trailing" && got(5L) == "tab  padded",
      s"XML source default no longer trims surrounding spaces: $got — " +
        "re-audit docs_xml_roundtrip's pinned option")
    assert(got(6L) == "inner  spaces", "interior whitespace must survive either way")
  }

  test("ignoreSurroundingSpaces=false preserves padded text byte-exactly; empty != null") {
    val got = roundtrip(ignoreSpaces = false)
    assert(got(1L) == "  leading")
    assert(got(2L) == "trailing  ")
    assert(got(5L) == "\ttab  padded\t")
    assert(got(6L) == "inner  spaces")
    // an empty string writes an empty element and reads back as "",
    // while null omits the element and reads back as null — the
    // distinction the checksum relies on
    assert(got(3L) == "")
    assert(got.get(4L).contains(null.asInstanceOf[String]))
  }
}

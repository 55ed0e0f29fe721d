package graft

import java.nio.file.{Files, Paths}

import graft.functions.TextFunctions
import graft.streaming.TempDir
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit contracts for round-5 primitives: the scratch-dir lifecycle
  * (every streaming creator pairs with a finally-delete — leaked tmpfs
  * dirs compete with the page cache) and the bigram builder (whose
  * zip_with form must equal the naive sliding-pair definition).
  */
class RoundPrimitivesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("TempDir.create + deleteRecursively round-trips, including nested content") {
    val dir = TempDir.create("graft-spec-")
    assert(Files.isDirectory(dir))
    val sub = Files.createDirectories(dir.resolve("a/b"))
    Files.writeString(sub.resolve("f.txt"), "x")
    TempDir.deleteRecursively(dir.toString)
    assert(!Files.exists(dir))
    // idempotent / never throws on a missing path
    TempDir.deleteRecursively(dir.toString)
    TempDir.deleteRecursively("/nonexistent/graft-never-" + System.nanoTime())
  }

  test("bigrams equals the naive sliding-pair definition") {
    import spark.implicits._
    val texts = Seq(
      "", "one", "a b", "a b c", "  padded   tokens  here ",
      "x x x x x", "the quick brown fox jumps over the lazy dog")
    val got = texts.toDF("text")
      .select(TextFunctions.bigrams(col("text")).as("bg"))
      .collect().map(_.getSeq[String](0).toList)
    val want = texts.map { t =>
      t.split("\\s+").filter(_.nonEmpty).toList.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toList
    }
    assert(got.toList == want)
  }
}

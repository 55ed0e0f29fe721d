package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MinHash + SimHash building blocks for near-duplicate detection
  * (SURVEY.md §2.2): character-shingling, k universal-hash minima,
  * LSH band hashes. Built on md5-derived 32-bit shingle hashes so the
  * DuckDB oracle computes the identical signature.
  *
  * Scale shape: signatures are a narrow per-row map (one scan, no
  * shuffle); LSH banding turns the O(n²) all-pairs problem into
  * `groupBy(band)` — one shuffle on band hash whose fan-in is the
  * candidate-bucket size, which is what makes near-dedup feasible on
  * 100 TB (brute-force pairwise never is).
  */
object MinHash {

  val Prime: Long = 4294967311L // smallest prime > 2^32
  val NumHashes: Int = 16
  val BandSize: Int = 4
  val NumBands: Int = NumHashes / BandSize

  def hashA(i: Int): Long = 2L * i + 1 // odd multipliers
  def hashB(i: Int): Long = 7L * i + 3

  /** Minhash signature value i: min over shingles of (a_i·x + b_i) mod P. */
  def sig(hashes: Column, i: Int): Column =
    array_min(transform(hashes, x => (x * hashA(i) + hashB(i)) % Prime))

  /** All the column plumbing in one go, SQL-expression based to keep
    * `substring(text, i, n)` with a *column* start position (the Scala
    * `substring` function only takes literal positions).
    */
  def shingleHashes(textCol: String, size: Int = 5): Column =
    expr(
      s"""transform(
         |  array_distinct(transform(
         |    sequence(1, greatest(length($textCol) - ${size - 1}, 1)),
         |    i -> substring($textCol, i, $size))),
         |  s -> cast(conv(substring(md5(s), 1, 8), 16, 10) as long))""".stripMargin)

  /** Band hash b: md5 of the comma-joined band's signature values. */
  def bandHash(sigCols: Seq[Column], band: Int): Column =
    md5(concat_ws(",", sigCols.slice(band * BandSize, (band + 1) * BandSize): _*))

  object Sql {
    def shingleHashes(text: String, size: Int = 5): String =
      s"""list_transform(
         |  list_distinct([substring($text, i, $size)
         |                 for i in range(1, greatest(length($text) - ${size - 1}, 1) + 1)]),
         |  s -> CAST(('0x' || substr(md5(s), 1, 8))::UBIGINT AS BIGINT))""".stripMargin
    def sig(hashes: String, i: Int): String =
      s"list_min(list_transform($hashes, x -> (x * ${hashA(i)} + ${hashB(i)}) % ${Prime}))"
  }
}

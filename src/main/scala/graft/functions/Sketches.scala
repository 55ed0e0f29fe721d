package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic sketch primitives: explicit HyperLogLog
  * registers and k-minimum-values (KMV) hash fractions, built from
  * md5 so the SAME register/sketch contents come out of Spark and the
  * DuckDB oracle (the `Sql` mirrors are literal-for-literal).
  *
  * Why explicit sketches when Spark ships DataSketches HLL
  * (`hll_sketch_agg`, spec-pinned in `HllSketchSpec`): sketch BYTES
  * are engine-specific, so the built-in can never be oracle-checked —
  * these deterministic forms make the sketch ARITHMETIC itself part
  * of the hash-exact surface (Flajolet et al. 2007 for HLL;
  * Bar-Yossef et al. 2002 for KMV). The scale story is the usual one:
  * registers/k-mins are bounded state with associative,
  * order-insensitive merges (max per register / k-smallest of a
  * union), so they partial-aggregate map-side and the shuffle carries
  * O(m) or O(k) per group instead of one row per distinct value.
  */
object Sketches {

  /** Register count m = 2^8: bucket key is the first two md5 hex
    * chars ('00'..'ff') — kept as the STRING so no base conversion is
    * needed on the grouping key in either engine.
    */
  val HllM = 256
  val HllBucketHexChars = 2

  /** Bits of hash used for the rho (leading-zero-run) estimate: the
    * 13 hex chars after the bucket = 52 bits, chosen so the value is
    * exact in a BIGINT *and* in a DOUBLE on both engines.
    */
  val HllRhoBits = 52

  /** 2^52 as a double (exact) — the KMV normalizer. */
  val TwoPow52 = 4503599627370496.0

  /** 2^53 — the register term scale: sum over registers of
    * 2^(53 - rho) stays integer-exact (max 256·2^52 < 2^63), making
    * the HLL indicator sum order-insensitive where a double sum of
    * 2^-rho terms would round differently per partition order.
    */
  val HllTermScale = 9007199254740992L

  /** md5 hex of any column's string form — the shared sketch hash. */
  def sketchHash(c: Column): Column = md5(c.cast("string"))

  /** HLL bucket key: first two hex chars of the sketch hash. */
  def hllBucket(h: Column): Column = substring(h, 1, HllBucketHexChars)

  /** rho = 1-based position of the first 1-bit in the 52-bit field
    * after the bucket chars (1..53; 53 when the field is all-zero).
    * Integer-exact on both engines: the field parses to a BIGINT and
    * `bin()` gives its minimal binary length, so
    * rho = 53 - length(bin(v)) with no floating-point log anywhere.
    */
  def hllRho(h: Column): Column = {
    val v = conv(substring(h, HllBucketHexChars + 1, 13), 16, 10).cast("long")
    when(v === 0L, lit(HllRhoBits + 1))
      .otherwise(lit(HllRhoBits + 1) - length(bin(v)))
      .cast("int")
  }

  /** The register's indicator term 2^(53 - rho) as an exact BIGINT
    * (pow of 2 with exponent in [0, 52] is exact in a double, so the
    * cast is the integer the oracle's `1::BIGINT << (53 - r)` shifts
    * to).
    */
  def hllTerm(r: Column): Column =
    pow(lit(2.0), lit(HllRhoBits + 1) - r).cast("long")

  /** KMV fraction: the first 13 hex chars as a uniform (0,1) double —
    * exact (52 bits fit the mantissa), so the (k-1)/u_k estimator is
    * one IEEE division on identical inputs in both engines.
    */
  def kmvFrac(h: Column): Column =
    conv(substring(h, 1, 13), 16, 10).cast("long") / lit(TwoPow52)

  /** DuckDB mirrors — literal-for-literal with the columns above. */
  object Sql {
    def sketchHash(c: String): String = s"md5(CAST($c AS VARCHAR))"
    def hllBucket(h: String): String = s"substr($h, 1, $HllBucketHexChars)"
    def hllRho(h: String): String =
      s"""CASE WHEN CAST(('0x' || substr($h, ${HllBucketHexChars + 1}, 13))::UBIGINT AS BIGINT) = 0
         | THEN ${HllRhoBits + 1}
         | ELSE CAST(${HllRhoBits + 1} - length(bin(CAST(('0x' || substr($h, ${HllBucketHexChars + 1}, 13))::UBIGINT AS BIGINT))) AS INTEGER)
         | END""".stripMargin.replaceAll("\n", "")
    def kmvFrac(h: String): String =
      s"CAST(('0x' || substr($h, 1, 13))::UBIGINT AS BIGINT) / $TwoPow52"
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column library for large-scale training-data
  * pipelines: tokenization, quality scoring, language ID, content
  * fingerprinting. Everything is built from codegen'd built-in
  * functions (split / higher-order functions / regexp) — no UDFs — so
  * the expressions fuse into whole-stage codegen and scale linearly
  * with no shuffle. Cross-engine-deterministic hashing goes through
  * md5 (identical bytes → identical hex in Spark and DuckDB), with
  * `Sql` mirrors for the oracle side.
  */
object TextFunctions {

  /** Whitespace tokens, empty-token-free. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Adjacent token bigrams ("a b"), empty for < 2 tokens — the unit
    * of the repetition quality signal (a document dominated by one
    * bigram is boilerplate/spam).
    *
    * Built with `zip_with` over two slices so the lambda touches only
    * its element variables: a lambda that references `tokens(text)`
    * (e.g. `transform(sequence…, i -> t[i])`) re-evaluates the whole
    * split-and-filter PER ELEMENT — measured 6× on the repetition
    * query at sf0.1.
    */
  def bigrams(text: Column): Column = {
    val t = tokens(text)
    val n = greatest(size(t) - 1, lit(0))
    zip_with(slice(t, lit(1), n), slice(t, lit(2), n),
      (a, b) => concat_ws(" ", a, b))
  }

  /** Adjacent word n-grams ("w1 … wn") over an ALREADY-TOKENIZED
    * array column — the contamination-check unit. Takes the token
    * array (not raw text) so callers project `tokens(text)` once and
    * the split isn't re-evaluated per slice. Same zip-of-slices shape
    * as [[bigrams]], folded n-wide: zip_with children are evaluated
    * once per row, so cost is n cheap slices, not n re-tokenizations.
    * Empty for docs with < n tokens.
    */
  def ngrams(toks: Column, n: Int): Column = {
    require(n >= 2, s"ngrams needs n >= 2, got $n")
    val cnt = greatest(size(toks) - (n - 1), lit(0))
    (1 to n).map(i => slice(toks, lit(i), cnt))
      .reduce((a, b) => zip_with(a, b, (x, y) => concat_ws(" ", x, y)))
  }

  /** Characters that are not lowercase letters, digits or space —
    * punctuation-ish, the usual quality heuristic numerator.
    */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[a-z0-9 ]", ""))

  /** First 8 md5 hex digits of a token as a Long in [0, 2^32) —
    * the deterministic 32-bit hash used by minhash/simhash/fingerprint.
    */
  def tokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 8), 16, 10).cast("long")

  /** Rolling polynomial fingerprint over the token stream:
    * acc = (acc * 31 + tokenHash) mod 1_000_000_007. Order-sensitive —
    * two documents share a fingerprint iff their token streams match.
    */
  def fingerprint(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) => pmod(acc * 31 + tokenHash(t), lit(1000000007L)))

  /** Stopword-hit ratio over a fixed marker list (English function
    * words) — a length-free fluency signal.
    */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "of", "to", "and", "in", "is", "on", "for")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isin(Stopwords: _*))).cast("double") / size(toks)
  }

  /** Language-marker scores: per language, the number of tokens that
    * hit that language's tiny function-word list. The n-gram-heuristic
    * language ID: argmax over marker scores, 'und' when all are zero.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"))

  def langScore(text: Column, lang: String): Column = {
    val markers = LangMarkers.toMap.apply(lang)
    size(filter(tokens(text), t => t.isin(markers: _*)))
  }

  /** Predicted language: argmax of marker scores; ties broken by list
    * order (en > de > es > fr); 'und' if no marker hits at all.
    */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (l, _) => l -> langScore(text, l) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), els) =>
      when(s === best && best > 0, lit(l)).otherwise(els)
    }
  }

  /** DuckDB mirrors (literal-for-literal) of the expressions above. */
  object Sql {
    def tokens(text: String): String =
      s"list_filter(string_split_regex($text, '\\s+'), t -> t != '')"
    def tokenCount(text: String): String = s"len(${tokens(text)})"
    def bigrams(text: String): String = {
      val t = tokens(text)
      s"[($t)[i] || ' ' || ($t)[i + 1] for i in range(1, len($t))]"
    }
    def ngrams(toks: String, n: Int): String = {
      val parts = (0 until n).map(j => s"($toks)[i + $j]").mkString(" || ' ' || ")
      s"[$parts for i in range(1, len($toks) - ${n - 2})]"
    }
    def punctCount(text: String): String =
      s"length(regexp_replace($text, '[a-z0-9 ]', '', 'g'))"
    def tokenHash(t: String): String =
      s"CAST(('0x' || substr(md5($t), 1, 8))::UBIGINT AS BIGINT)"
    def fingerprint(text: String): String =
      s"list_reduce(list_prepend(0::BIGINT, ${tokens(text)}" +
        s".list_transform(t -> ${tokenHash("t")})), (acc, h) -> (acc * 31 + h) % 1000000007)"
    def stopwordRatio(text: String): String = {
      val sw = Stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
      s"len(list_filter(${tokens(text)}, t -> list_contains($sw, t)))::DOUBLE / len(${tokens(text)})"
    }
    def langScore(text: String, lang: String): String = {
      val markers = LangMarkers.toMap.apply(lang).map(s => s"'$s'").mkString("[", ", ", "]")
      s"len(list_filter(${tokens(text)}, t -> list_contains($markers, t)))"
    }
    def langId(text: String): String = {
      val scores = LangMarkers.map { case (l, _) => l -> langScore(text, l) }
      val best = scores.map(_._2).reduceRight((a, b) => s"greatest($a, $b)")
      scores.foldRight("'und'") { case ((l, s), els) =>
        s"CASE WHEN $s = $best AND $best > 0 THEN '$l' ELSE $els END"
      }
    }
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives as `Column` expressions — tokenization, trigram
  * sets, word n-gram shingles, set similarity. All are built-in
  * higher-order functions (codegen'd, no UDFs) and every construct
  * has an exact DuckDB equivalent so oracle SQL can reproduce results
  * hash-identically.
  *
  * The trigram machinery re-expresses pg_trgm's set-similarity used
  * by the reference's fuzzy name search (reference:
  * db/search_strategies.py:96-124 `similarity(card_name, q)`;
  * db/init.sql:31 gin_trgm_ops): similarity = |T(a) ∩ T(b)| /
  * |T(a) ∪ T(b)| over distinct 3-grams of the lowercased string
  * (we skip pg_trgm's space padding — same ranking behavior, simpler
  * cross-engine parity).
  */
object TextFunctions {

  /** Whitespace tokens (the corpus is single-space separated). */
  def tokens(c: Column): Column = split(c, " ")

  /** Distinct token set. */
  def tokenSet(c: Column): Column = array_distinct(tokens(c))

  /** Distinct character 3-gram set of a lowercased string — native
    * fused kernel ([[graft.plans.Trigrams]], whole-stage codegen);
    * bit-identical (content AND order) to [[trigramsBuiltin]]
    * (TextFunctionsSpec). Feeds the trigram prefilter's
    * `arrays_overlap` and the trigram posting-index build. */
  def trigrams(c: Column): Column = graft.plans.Trigrams(c)

  /** Composed-HOF reference formulation of [[trigrams]] — kept for
    * the cross-check and as [[trigramSimBuiltin]]'s building block
    * (built by zipping the char array with its shifted selves; the
    * per-element `substr(i, 3)` alternative pays eval dispatch that
    * array iteration doesn't). */
  def trigramsBuiltin(c: Column): Column = {
    val lc = lower(c)
    val ch = split(lc, "")
    val n = length(lc)
    val joined = (1 to 2).foldLeft(ch) { (acc, j) =>
      zip_with(acc, slice(ch, lit(j + 1), greatest(n - j, lit(1))),
        (a, b) => concat(a, b))
    }
    when(n < 3, array().cast("array<string>"))
      .otherwise(array_distinct(slice(joined, lit(1), n - 2)))
  }

  /** Jaccard similarity of two pre-distinct string arrays. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(0.0d))
      .otherwise(size(array_intersect(a, b)).cast("double") /
        size(array_union(a, b)).cast("double"))

  /** pg_trgm-style similarity between two strings — native fused
    * kernel ([[graft.plans.TrigramSim]], whole-stage codegen);
    * bit-identical to [[trigramSimBuiltin]]. */
  def trigramSim(a: Column, b: Column): Column = graft.plans.TrigramSim(a, b)

  /** Composed-HOF reference formulation of [[trigramSim]] — kept for
    * the bitwise cross-check in TrigramSimSpec (the HOF tree is
    * interpreted and allocates several arrays per row; the native
    * expression exists for the hot paths). */
  def trigramSimBuiltin(a: Column, b: Column): Column =
    jaccard(trigramsBuiltin(a), trigramsBuiltin(b))

  /** Distinct word n-gram shingle set (n >= 2) — native fused kernel
    * ([[graft.plans.WordShingles]], whole-stage codegen, one pass,
    * no intermediate arrays); bit-identical to
    * [[wordShinglesBuiltin]] (TextFunctionsSpec + KernelProperties).
    */
  def wordShingles(c: Column, n: Int): Column =
    graft.plans.WordShingles(c, n)

  /** Composed-HOF reference formulation of [[wordShingles]] — kept
    * for the cross-check (the HOF tree is interpreted and allocates
    * several arrays per row: zip_with shifts + array_distinct +
    * slice; zip_with pads the shorter side with null, which
    * null-propagates through concat, and the final slice drops those
    * tail slots). */
  def wordShinglesBuiltin(c: Column, n: Int): Column = {
    val t = tokens(c)
    val joined = (1 until n).foldLeft(t) { (acc, j) =>
      zip_with(acc, slice(t, lit(j + 1), greatest(size(t) - j, lit(1))),
        (a, b) => concat(a, lit(" "), b))
    }
    when(size(t) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        slice(joined, lit(1), size(t) - (n - 1))))
  }

  /** The "name" of a document — lowercased 24-char prefix, standing
    * in for card_name in the reference's name-search tiers. */
  def docName(textCol: Column): Column = lower(substring(textCol, 1, 24))

  /** Driver-side twin of [[trigrams]] for query strings known at plan
    * time (the probe side of the trigram posting index): distinct
    * character 3-grams of the lowercased string, order of first
    * appearance. */
  def trigramsOf(s: String): Seq[String] = {
    val lc = s.toLowerCase
    if (lc.length < 3) Seq.empty
    else (0 to lc.length - 3).map(i => lc.substring(i, i + 3)).distinct
  }
}

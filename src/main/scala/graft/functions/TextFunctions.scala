package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.CoreOps

/** Text-analysis operators for large-scale training-data pipelines
  * (north-star extension tier; SURVEY.md §7.3 M4): token counting,
  * language-ID heuristics, quality scoring, and order-sensitive document
  * fingerprints.
  *
  * Every function is a pure per-row Column expression (whole-stage
  * codegen'd, no UDFs, no shuffles) except the fingerprint, which is one
  * explode + hash-aggregate — the shape that scales linearly over 100 TB of
  * documents. All arithmetic is integer-exact or fixed-order double math so
  * results are reproducible across engines and partitionings.
  */
object TextFunctions {

  /** Whitespace tokenizer — the testdata's `documents.text` is
    * space-separated tokens (FIXTURES.md).
    */
  def tokens(c: Column): Column = split(c, " ")

  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** BPE-ish subword-boundary token count: letter runs, digit runs, and
    * punctuation runs each count as one token (the GPT-2 pre-tokenizer
    * shape, minus byte-level details). The pattern avoids lookarounds so it
    * behaves identically under Java regex (Spark) and RE2 (DuckDB).
    */
  val BpeishPattern: String = "\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]+"

  def tokenCountBpeish(c: Column): Column =
    regexp_count(c, lit(BpeishPattern)).cast("long")

  /** Canonical text normalization for corpus preparation — the cleaning
    * stage that precedes exact dedup so trivial variants (case, runs of
    * whitespace, stray URLs) collapse to one representative: strip
    * http(s) URLs (case-insensitively — `HTTP://X` is as much a URL as
    * `http://x` — and only up to the next whitespace of ANY kind, so a
    * URL at end-of-line never swallows the following line), lowercase,
    * squeeze whitespace, trim. Pure codegen'd expressions, and every
    * regex is RE2-safe (no lookarounds) with identical semantics in Java,
    * so any engine reproduces the exact output bytes — which is what
    * makes dedup-by-normalized-digest portable.
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      lower(regexp_replace(c, "(?i)https?://\\S+", "")), "\\s+", " "))

  /** PII detection/redaction patterns, applied in this order (email first:
    * an address contains dots a later pattern must not see). Each regex is
    * RE2-safe — character classes, bounded repetition, `\b`, no
    * lookarounds — so Java (Spark) and RE2 (DuckDB) match identically:
    *   - email: local@domain.tld
    *   - ipv4: four dot-separated 1-3 digit runs on word boundaries
    *   - phone: international-style +digits with optional dash/space
    *     separators (anchored on `+` so it never fires inside an IPv4).
    *     The separator run is bounded at 18 — an unbounded greedy tail
    *     would absorb arbitrarily long digit-group chains after a number;
    *     the bound caps the blast radius at one plausible phone length
    *     (a standalone digit within 18 chars of a phone can still be
    *     swallowed — the price of staying RE2-safe with no lookarounds)
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
    ("phone", "\\+\\d[\\d\\- ]{5,18}\\d", "<PHONE>"))

  /** Count of non-overlapping matches for one PII category ("email",
    * "ipv4", "phone") — the audit metric scrubbing reports per document.
    *
    * Counted on the text with all EARLIER categories already redacted —
    * the same order [[piiScrub]] applies — so the counts reconcile exactly
    * with the placeholders the scrub emits. Counting every category on the
    * raw text would over-report nested matches: 'a@1.2.3.4.co' is ONE
    * redaction (<EMAIL>), but the raw text also matches the IPv4 pattern
    * inside the domain, and an audit claiming an IP was scrubbed when no
    * <IP> placeholder exists breaks any downstream reconciliation.
    */
  def piiCount(text: Column, category: String): Column = {
    val idx = PiiPatterns.indexWhere(_._1 == category)
    require(idx >= 0,
      s"unknown PII category: $category (have ${PiiPatterns.map(_._1)})")
    val prior = PiiPatterns.take(idx).foldLeft(text) {
      case (c, (_, pattern, replacement)) =>
        regexp_replace(c, pattern, replacement)
    }
    regexp_count(prior, lit(PiiPatterns(idx)._2)).cast("long")
  }

  /** Redact all PII categories, applying the patterns in declaration
    * order. Pure codegen'd per-row expressions — the scrub is a map-only
    * stage at any corpus size.
    */
  def piiScrub(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (_, pattern, replacement)) =>
      regexp_replace(c, pattern, replacement)
    }

  /** Number of tokens present in a fixed wordlist (per-language stopword
    * scoring for lang-ID). Counts every occurrence, not distinct tokens.
    */
  def wordlistHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => array_contains(typedlit(words), t)))
      .cast("long")

  /** Small per-language stopword lists for the n-gram-free lang-ID
    * heuristic. Order matters: ties resolve to the earlier language.
    */
  val LangWordlists: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "los", "y"),
    "fr" -> Seq("le", "les", "et", "des", "une"))

  /** First-wins argmax over the per-language scores (deterministic
    * tie-break by list order).
    */
  def langPredict(text: Column): Column = {
    val scores = LangWordlists.map { case (l, ws) => l -> wordlistHits(text, ws) }
    def pick(rest: List[(String, Column)]): Column = rest match {
      case (l, _) :: Nil => lit(l)
      case (l, s) :: tail =>
        when(tail.map(_._2).foldLeft(lit(true))((acc, o) => acc && s >= o), l)
          .otherwise(pick(tail))
      case Nil => lit(null)
    }
    // null guard: with null text every score comparison is null-not-true,
    // so the fold would fall through to the terminal case and confidently
    // label a null document with the LAST list entry
    when(text.isNull, lit(null).cast("string")).otherwise(pick(scores.toList))
  }

  /** Ratio of characters matched by `charClass` (a single-char regex class
    * like "[0-9]"), computed as (len - len(stripped)) / len so both engines
    * share the exact same integer inputs. 0.0 for empty strings.
    */
  def charRatio(c: Column, charClass: String): Column =
    when(length(c) === 0, 0.0).otherwise(
      (length(c) - length(regexp_replace(c, charClass, ""))).cast("double")
        / length(c))

  /** Heuristic quality scoring in [0,1]: length saturation + stopword
    * density + non-digit purity. Rational arithmetic only (no
    * transcendentals — libm results differ across engines); components are
    * rounded before combining so the composite is reproducible. This is
    * the single home of the formula — the graded `quality_score` query
    * selects from these columns rather than re-deriving them.
    */
  def withQualityColumns(df: DataFrame, textCol: String): DataFrame = {
    import CoreOps.rnd
    val text = col(textCol)
    df.withColumn("n_tokens", tokenCount(text))
      .withColumn("stop_ratio",
        rnd(wordlistHits(text, LangWordlists.head._2).cast("double")
          / greatest(col("n_tokens"), lit(1L))))
      .withColumn("digit_ratio", rnd(charRatio(text, "[0-9]")))
      .withColumn("quality",
        rnd(least(col("n_tokens").cast("double") / 100.0, lit(1.0)) * 0.5
          + col("stop_ratio") * 0.3 + (lit(1.0) - col("digit_ratio")) * 0.2))
  }

  /** Repetition / boilerplate signals per document — the Gopher-style
    * corpus filters (Rae et al. 2021 §A1.1) a pretraining pipeline gates
    * on: duplicate-token fraction, duplicate-bigram fraction, and the
    * dominance of the single most frequent token. High values flag
    * templated/boilerplate text that survives exact and near dedup because
    * the repetition is WITHIN the document.
    *
    * Scale shape: the ratio columns are pure per-row expressions; the
    * most-frequent-token count is one explode + two hash-aggregates keyed
    * by (id, token) then id — linear, map-side-combined, same shape as
    * [[fingerprint]]. All ratios are 4-dp-rounded rational arithmetic so
    * any engine reproduces them bit-for-bit.
    */
  def repetitionSignals(df: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    import CoreOps.rnd
    val base = df.select(col(idCol), tokens(col(textCol)).as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      // split() never yields an empty array (empty text → [""]), so the
      // n_tokens divisors are always >= 1
      .withColumn("dup_token_ratio",
        rnd((col("n_tokens") - size(array_distinct(col("toks"))))
          .cast("double") / col("n_tokens")))
      .withColumn("grams", expr(
        "zip_with(slice(toks, 1, size(toks) - 1), " +
          "slice(toks, 2, size(toks) - 1), (x, y) -> concat(x, ' ', y))"))
      .withColumn("dup_2gram_ratio",
        when(size(col("grams")) === 0, 0.0).otherwise(
          rnd((size(col("grams")) - size(array_distinct(col("grams"))))
            .cast("double") / size(col("grams")))))
    // Single pass over the tokenized projection (no second tokenizing
    // branch + join): explode the already-computed toks and carry the
    // per-row ratio columns through the two aggregates as grouping keys —
    // they are constant per id, so group cardinality is unchanged and
    // tokenization (the dominant per-row cost) happens exactly once.
    // explode_outer, not explode: a null-text doc has null toks and emits
    // one row with a null token (count(t) = 0 → null ratios), where a
    // plain explode would silently DROP its id from the output.
    base.select(col(idCol), col("n_tokens"), col("dup_token_ratio"),
        col("dup_2gram_ratio"), explode_outer(col("toks")).as("t"))
      .groupBy(col(idCol), col("n_tokens"), col("dup_token_ratio"),
        col("dup_2gram_ratio"), col("t"))
      .agg(count(col("t")).as("c"))
      .groupBy(col(idCol), col("n_tokens"), col("dup_token_ratio"),
        col("dup_2gram_ratio"))
      .agg(max(col("c")).as("__max_tok"))
      .withColumn("max_token_ratio",
        rnd(col("__max_tok").cast("double") / col("n_tokens")))
      .select(col(idCol), col("n_tokens"), col("dup_token_ratio"),
        col("dup_2gram_ratio"), col("max_token_ratio"))
  }

  /** Order-sensitive document fingerprint: sum over tokens of
    * (codepoint(first char) * 131 + len(token)) * position, mod 1e9+7.
    * Position-weighted integer sums are order-independent to compute
    * (associative, exact) yet order-sensitive in value — a permutation of
    * tokens changes the fingerprint — and are expressible identically in
    * any SQL engine, unlike a sequential rolling hash.
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // posexplode_outer: a NULL-text document must keep its id in the
    // output (null fingerprint), not vanish — plain posexplode of a null
    // array emits zero rows and silently drops the document (the same
    // invariant repetitionSignals documents for explode_outer).
    df.select(col(idCol),
        posexplode_outer(tokens(col(textCol))).as(Seq("pos", "t")))
      .groupBy(idCol)
      // Long arithmetic with pmod applied PER TERM, not only on the final
      // sum: ascii() yields the full Unicode codepoint (up to 0x10FFFF),
      // so an un-modded position-weighted term is ~1.5e8·pos and the
      // running sum would overflow Long near position ~355k on a CJK
      // corpus (ANSI ARITHMETIC_OVERFLOW). Reduced terms stay < 1e9+7, so
      // the sum is safe to ~9e9 tokens, and sum-of-residues mod p equals
      // mod-of-sum — the fingerprint value is unchanged (and the oracle,
      // which sums in HUGEINT, agrees).
      .agg(pmod(sum(pmod((ascii(col("t")).cast("long") * 131L + length(col("t")))
        * (col("pos") + 1), lit(1000000007L))), lit(1000000007L))
        .as("fingerprint"))
}

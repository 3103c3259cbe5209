package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, n-grams/shingles, quality scoring, language ID,
  * fingerprinting. All pure Catalyst expressions (no UDFs) — they run
  * inside whole-stage codegen and scale linearly with input size.
  */
object TextFunctions {

  /** Whitespace tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Let-bind an array expression through a single-element `transform`
    * so it evaluates ONCE per row no matter how many times the body
    * references it — Catalyst expressions are trees, not DAGs, and the
    * HOF consumers here are CodegenFallback (no codegen-level common-
    * subexpression elimination), so every textual reuse of a split
    * re-runs the regex over the document (the wordNgrams O(words²)
    * lesson, measured 2.5×).
    */
  private def bound(arr: Column)(body: Column => Column): Column =
    transform(array(arr), body).getItem(0)

  /** BPE-ish subword count estimate: word/number/punctuation pieces plus a
    * length penalty for long words (≈ GPT-style `words + extra pieces`).
    */
  def tokenEstimate(text: Column): Column =
    bound(filter(split(text, "[^A-Za-z0-9]+"), t => length(t) > 0)) { pieces =>
      (size(pieces) +
        aggregate(pieces, lit(0),
          (acc, w) => acc + floor(length(w) / 5).cast(IntegerType))).cast(LongType)
    }

  /** Word n-grams joined with single spaces (empty array when too short).
    *
    * The token array is let-bound through a single-element `transform`
    * so the regex split evaluates ONCE per row: inlining `tokens(text)`
    * into the per-index lambda would re-split the document for every
    * n-gram — O(words²) regex work per row (measured 4.6 s → 1.8 s on
    * the sf0.1 contamination query).
    */
  def wordNgrams(text: Column, n: Int): Column =
    transform(array(tokens(text)), toks =>
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          j => concat_ws(" ", slice(toks, j, lit(n)))))
        .otherwise(array().cast(ArrayType(StringType))))
      .getItem(0)

  /** Character k-shingles of the raw text. */
  def charShingles(text: Column, k: Int): Column =
    when(length(text) >= k,
      transform(sequence(lit(1), length(text) - (k - 1)),
        i => text.substr(i, lit(k))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Punctuation character ratio (0 when empty). */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]]", ""))
        .cast(DoubleType) / length(text))
      .otherwise(0.0)

  /** Mean token length (0 when no tokens). */
  def meanTokenLen(text: Column): Column = bound(tokens(text)) { toks =>
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t))
        .cast(DoubleType) / size(toks))
      .otherwise(0.0)
  }

  private val enStop = Seq("the", "a", "of", "and", "to", "in", "is", "that")
  private val deStop = Seq("der", "die", "das", "und", "ist", "nicht", "ein")
  private val frStop = Seq("le", "la", "les", "et", "est", "un", "une", "du")
  private val esStop = Seq("el", "la", "los", "las", "es", "un", "una", "del")

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  /** Stopword ratio against the English list (quality signal). */
  def stopwordRatio(text: Column): Column = bound(tokens(text)) { toks =>
    when(size(toks) > 0,
      hitCount(toks, enStop).cast(DoubleType) / size(toks))
      .otherwise(0.0)
  }

  /** Composite quality score in [0,1]: length sweet-spot, moderate mean
    * word length, some stopwords, low punctuation noise. The individual
    * signals mirror common LLM-corpus heuristics (Gopher/C4 rules).
    * The token array is bound ONCE for the word-length and stopword
    * signals (the inlined spelling re-split the document per signal).
    */
  def qualityScore(text: Column): Column = {
    // the two token signals ride ONE binding as a struct (2 getField
    // references ⇒ the tokenizer runs twice per row — down from ~9
    // textual expansions in the inlined spelling); the length and
    // punctuation signals stay OUTSIDE the (interpreted) lambda where
    // they whole-stage-codegen. Addition keeps the ORIGINAL association
    // ((len+word)+stop)+punct — double addition is order-sensitive and
    // the oracle hash is exact.
    val tok = bound(tokens(text)) { toks =>
      val mwl = when(size(toks) > 0,
        aggregate(toks, lit(0L), (acc, t) => acc + length(t))
          .cast(DoubleType) / size(toks))
        .otherwise(0.0)
      val sr = when(size(toks) > 0,
        hitCount(toks, enStop).cast(DoubleType) / size(toks))
        .otherwise(0.0)
      struct(
        when(mwl.between(3.0, 10.0), 1.0).otherwise(0.5).as("ws"),
        least(sr * 5.0, lit(1.0)).as("ss"))
    }
    val lenScore = least(length(text).cast(DoubleType) / 500.0, lit(1.0))
    val wordScore = tok.getField("ws")
    val stopScore = tok.getField("ss")
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5.0)
    round((lenScore + wordScore + stopScore + punctScore) / 4.0, 6)
  }

  /** Stopword-profile language ID over {en,de,fr,es}, 'und' (undetermined)
    * when no list scores a hit. Deterministic tie-break by language order.
    * One tokenization per row (bound) — the inlined spelling re-split the
    * document once per language list.
    */
  def langId(text: Column): Column = bound(tokens(lower(text))) { toks =>
    val en = hitCount(toks, enStop)
    val de = hitCount(toks, deStop)
    val fr = hitCount(toks, frStop)
    val es = hitCount(toks, esStop)
    val best = greatest(en, de, fr, es)
    when(best === 0, "und")
      .when(en === best, "en")
      .when(de === best, "de")
      .when(fr === best, "fr")
      .otherwise("es")
  }

  /** Content fingerprint: md5 of case-folded, whitespace-collapsed text.
    * Cross-engine stable (see [[HashFunctions]] design note).
    */
  def fingerprint(text: Column): Column =
    HashFunctions.md5Hex(trim(regexp_replace(lower(text), "\\s+", " ")))
}

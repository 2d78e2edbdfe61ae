package graft

import graft.functions.TextFeatures
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis column functions for training-data pipelines:
 * token counting, quality scoring, stopword-profile language ID,
 * and content fingerprinting. All are pure Catalyst expression trees
 * (no UDFs) so they stay inside whole-stage codegen — at 100 TB the
 * entire text pass is one scan with no serialization boundary.
 *
 * Determinism: only regex constructs shared by Java and RE2 are used
 * so the DuckDB oracles match byte-for-byte.
 */
object TextAnalysisCols {

  /** Whitespace tokens of trimmed text (empty string → empty array). */
  def wsTokens(c: Column): Column = {
    val trimmed = trim(c)
    when(length(trimmed) === 0, array().cast("array<string>"))
      .otherwise(split(trimmed, "\\s+"))
  }

  def wsTokenCount(c: Column): Column = size(wsTokens(c))

  /** BPE-ish token count: letter runs, digit runs, single punct. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Common-English stopwords used by quality scoring. */
  val EnStop: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  private def countIn(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isin(words: _*)))

  /**
   * Quality features: token count, stopword count/ratio, punctuation
   * count/ratio, and a combined [0,1] score — computed by the native
   * one-pass [[TextFeatures.TextQualityExpr]] (the equivalent
   * split/filter/regexp Column tree re-materialized token arrays per
   * derived column; ~10× slower at sf0.1).
   */
  def qualityFeatures(c: Column): Seq[Column] = {
    val q = TextFeatures.qualityStruct(c, EnStop)
    TextFeatures.Fields.map { case (n, _) => q.getField(n).as(n) }
  }

  /** Per-language stopword profiles for the language-ID heuristic. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "los", "que", "y"),
    "fr" -> Seq("le", "les", "et", "des", "un", "une"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"))

  /**
   * Language ID: count profile-stopword hits per language, pick the
   * max (ties broken by profile order, zero hits → "und").
   */
  def langId(c: Column): Column = {
    val tokens = wsTokens(c)
    val scores = LangProfiles.map { case (lang, words) => lang -> countIn(tokens, words) }
    val maxScore = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, score), els) =>
      when(score > 0 && score === maxScore, lit(lang)).otherwise(els)
    }
  }

  /** Normalized fingerprint: md5 over sorted lowercase tokens. */
  def normFingerprint(c: Column): Column =
    md5(array_join(array_sort(wsTokens(lower(c))), " "))

  /**
   * CCNet-STYLE TEXT NORMALIZATION (the canonical form hashed for
   * fuzzy dedup keys): lowercase → control chars to spaces →
   * (optionally ASCII punctuation to spaces) → whitespace runs
   * collapsed to one space → trimmed. A pure Column tree, one
   * codegen'd pass; regex classes restricted to the Java∩RE2 subset
   * (`\p{Punct}` here ≡ `[[:punct:]]` in RE2 — the same ASCII set).
   */
  def normalizeText(c: Column, stripPunct: Boolean = false): Column = {
    val noCtl = regexp_replace(lower(c), "[\\x00-\\x1f\\x7f]", " ")
    val noPunct =
      if (stripPunct) regexp_replace(noCtl, "\\p{Punct}", " ") else noCtl
    trim(regexp_replace(noPunct, "\\s+", " "))
  }

  /** Gopher-rule stopwords (the "must contain ≥ 2 of" set). */
  val GopherStop: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * GOPHER-STYLE QUALITY RULES (the repetition-free subset of the
   * Gopher/MassiveText document filters, as also used by FineWeb):
   * word-count bounds, mean word length, bullet/ellipsis line
   * fractions, alphabetic-word fraction, stopword presence and a
   * symbol-to-word ratio, combined into one `gopher_keep` flag.
   * Emitted as FEATURES (not a filter) so thresholds stay a
   * downstream policy decision and every document remains auditable.
   *
   * Determinism: every ratio is one double division of exact integer
   * counts; regexes are in the Java∩RE2 subset; no libm calls — the
   * features hash-match a DuckDB oracle bit-for-bit.
   *
   * Scale: a pure scan-side Column tree (no UDFs, no shuffle); the
   * whole rule set is one pass inside whole-stage codegen.
   */
  def gopherFeatures(c: Column): Seq[Column] = {
    val words = wsTokens(c)
    val nW = size(words).cast("long")
    val sumLen = aggregate(words, lit(0L), (acc, w) => acc + length(w).cast("long"))
    val meanLen = when(nW === 0, lit(0.0)).otherwise(sumLen.cast("double") / nW)
    val nAlpha = size(filter(words, w => w.rlike("[a-zA-Z]"))).cast("long")
    val fracAlpha = when(nW === 0, lit(0.0)).otherwise(nAlpha.cast("double") / nW)
    val lowWords = wsTokens(lower(c))
    val nStop = GopherStop.map(sw =>
      when(array_contains(lowWords, sw), lit(1L)).otherwise(lit(0L))).reduce(_ + _)
    val lines = split(c, "\n")
    val nL = size(lines).cast("long") // split never yields [], so nL >= 1
    val nBullet = size(filter(lines, l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("• "))).cast("long")
    val nEllipsis = size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…"))).cast("long")
    val nSymbols = (length(c) - length(regexp_replace(c, "#", ""))).cast("long") +
      (length(c) - length(regexp_replace(c, "…", ""))).cast("long")
    val symRatio = when(nW === 0, lit(0.0)).otherwise(nSymbols.cast("double") / nW)
    val fracBullet = nBullet.cast("double") / nL
    val fracEllipsis = nEllipsis.cast("double") / nL
    val keep = nW >= 50 && nW <= 100000 &&
      meanLen >= 3.0 && meanLen <= 10.0 &&
      fracBullet < 0.9 && fracEllipsis < 0.3 &&
      fracAlpha > 0.8 && nStop >= 2 && symRatio < 0.1
    Seq(
      nW.as("n_words"),
      meanLen.as("mean_word_len"),
      fracAlpha.as("frac_alpha_words"),
      nStop.as("n_stopwords"),
      fracBullet.as("frac_lines_bullet"),
      fracEllipsis.as("frac_lines_ellipsis"),
      symRatio.as("symbol_ratio"),
      keep.as("gopher_keep"))
  }

  /**
   * GOPHER REPETITION RULES: duplicate-line fraction, the fraction of
   * characters inside duplicated lines (occurrences beyond the first),
   * and the character share of the most frequent word bigram — the
   * within-document repetition half of the Gopher/MassiveText filters
   * (the cross-document half is the dedup family).
   *
   * Each statistic is a SINGLE MAP-SIDE PASS: sort the per-doc line /
   * bigram array once, then fold it with `aggregate`, counting run
   * lengths — no explode, no shuffle, no per-element re-scan (the
   * naive `filter(lines, l => l === x)` inner loop would be O(L²) per
   * document). Ties for the top bigram break to the lexicographically
   * larger value, mirroring the oracle's ORDER BY count DESC, bigram
   * DESC.
   *
   * Thresholds in `rep_keep` are the published Gopher cuts:
   * dup-line fraction < 0.3, dup-line char fraction < 0.2, top-bigram
   * char share < 0.18.
   */
  def gopherRepFeatures(c: Column): Seq[Column] = {
    val totalChars = length(c).cast("long")
    val lines = split(c, "\n")
    val nL = size(lines).cast("long")
    val nDistinct = size(array_distinct(lines)).cast("long")
    val fracDupLines = (nL - nDistinct).cast("double") / nL
    // chars in duplicate line occurrences beyond the first: fold the
    // sorted array, adding (run - 1) * len when a run closes
    val sortedLines = array_sort(lines)
    val dupChars = aggregate(sortedLines,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"), lit(0L).as("chars")),
      (acc, x) => {
        val same = acc.getField("prev") <=> x
        val closed = when(same, acc.getField("chars")).otherwise(
          acc.getField("chars") +
            (acc.getField("run") - 1) * coalesce(length(acc.getField("prev")).cast("long"), lit(0L)))
        struct(x.as("prev"),
          when(same, acc.getField("run") + 1).otherwise(lit(1L)).as("run"),
          closed.as("chars"))
      },
      acc => acc.getField("chars") +
        (acc.getField("run") - 1) * coalesce(length(acc.getField("prev")).cast("long"), lit(0L)))
    val fracDupChars = when(totalChars === 0, lit(0.0))
      .otherwise(dupChars.cast("double") / totalChars)
    // top word bigram by (count, value): same sorted-run fold
    val words = wsTokens(lower(c))
    val bigrams = when(size(words) < 2, array().cast("array<string>"))
      .otherwise(zip_with(slice(words, lit(1), size(words) - 1),
        slice(words, lit(2), size(words) - 1),
        (a, b) => concat(a, lit(" "), b)))
    val sortedB = array_sort(bigrams)
    val top = aggregate(sortedB,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("bestCnt"), lit("").as("bestVal")),
      (acc, x) => {
        val same = acc.getField("prev") <=> x
        // runs close in ascending value order, so on equal counts the
        // later (larger) value wins: >= is the (cnt, value) lex max
        val closeWins = !same && acc.getField("run") >= acc.getField("bestCnt")
        struct(x.as("prev"),
          when(same, acc.getField("run") + 1).otherwise(lit(1L)).as("run"),
          when(closeWins, acc.getField("run")).otherwise(acc.getField("bestCnt")).as("bestCnt"),
          when(closeWins, acc.getField("prev")).otherwise(acc.getField("bestVal")).as("bestVal"))
      },
      acc => {
        val lastWins = acc.getField("run") >= acc.getField("bestCnt")
        struct(
          when(lastWins, coalesce(acc.getField("prev"), lit(""))).otherwise(acc.getField("bestVal")).as("v"),
          when(lastWins, acc.getField("run")).otherwise(acc.getField("bestCnt")).as("n"))
      })
    val topBigram = when(size(bigrams) === 0, lit("")).otherwise(top.getField("v"))
    val topCount = when(size(bigrams) === 0, lit(0L)).otherwise(top.getField("n"))
    val topShare = when(totalChars === 0 || size(bigrams) === 0, lit(0.0))
      .otherwise(topCount * length(topBigram).cast("long") / totalChars.cast("double"))
    val keep = fracDupLines < 0.3 && fracDupChars < 0.2 && topShare < 0.18
    Seq(
      nL.as("n_lines"),
      fracDupLines.as("frac_dup_lines"),
      fracDupChars.as("frac_chars_dup_lines"),
      topBigram.as("top_bigram"),
      topCount.as("top_bigram_count"),
      topShare.as("top_bigram_char_frac"),
      keep.as("rep_keep"))
  }

  /** Blocklist screening via the [[graft.functions.AhoCorasick]]
    * automaton: number of DISTINCT `terms` present as substrings —
    * ONE O(len) pass however many terms (vs O(terms·len) for
    * per-term contains probes). Substring semantics matches DuckDB
    * `contains`, so the oracle replicates counts exactly. */
  def blocklistHits(c: Column, terms: Seq[String]): Column =
    graft.functions.AhoCorasick.multiMatchCount(c, terms)

  /** Unicode script classes for [[scriptProfile]]: name → character
    * class, in dominant-script tie-break order. Ranges are BMP-only
    * and written `\x{…}` — the hex-escape syntax Java and RE2 share,
    * so the DuckDB oracle uses the identical pattern strings. */
  val ScriptClasses: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "greek" -> "[\\x{0370}-\\x{03FF}]",
    "arabic" -> "[\\x{0600}-\\x{06FF}]",
    "cjk" -> "[\\x{3040}-\\x{30FF}\\x{4E00}-\\x{9FFF}]")

  /** Count of characters of `c` matching regex class `cls` — the
    * strip-and-diff formulation (`len(s) − len(s without cls)`) that
    * DuckDB reproduces verbatim. */
  private def charClassCount(c: Column, cls: String): Column =
    (length(c) - length(regexp_replace(c, cls, ""))).cast("long")

  /**
   * SCRIPT PROFILE — per-document Unicode script composition: the
   * character count per script class, the dominant script (most
   * characters; ties break in [[ScriptClasses]] order; no script
   * characters at all → "none"), and the dominant script's fraction
   * of non-whitespace characters. Language-ID by stopwords
   * ([[langId]]) only works within an alphabet; script detection is
   * the coarse routing step before it (a Cyrillic document should
   * never reach an English quality model), and a high "other"
   * fraction is itself a junk signal (mojibake, binary spill).
   *
   * One codegen'd pass, zero shuffle — at 100 TB this rides the same
   * scan as every other text gate.
   */
  def scriptProfile(c: Column): Seq[Column] = {
    val counts = ScriptClasses.map { case (n, cls) => n -> charClassCount(c, cls) }
    val wsCount = (length(c) - length(regexp_replace(c, "\\s", ""))).cast("long")
    val total = (length(c) - wsCount) // non-whitespace characters
    val maxCount = greatest(counts.map(_._2): _*)
    val main = counts.foldRight(lit("none")) { case ((name, cnt), els) =>
      when(cnt > 0 && cnt === maxCount, lit(name)).otherwise(els)
    }
    val mainFrac = when(total === 0, lit(0.0))
      .otherwise(maxCount.cast("double") / total.cast("double"))
    counts.map { case (n, cnt) => cnt.as(s"n_$n") } ++ Seq(
      total.as("n_nonspace"),
      main.as("main_script"),
      when(main === "none", lit(0.0)).otherwise(mainFrac).as("main_frac"))
  }
}

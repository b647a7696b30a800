package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale document pipelines
  * (capability extension beyond the reference — SURVEY §7.3 /
  * BASELINE.json north star): token stats, quality scoring, language
  * ID, and document fingerprinting over the `documents` table.
  *
  * All functions are native column expressions (split / transform /
  * aggregate higher-order functions) — codegen-friendly, no UDFs, and
  * embarrassingly parallel: per-document work with no shuffle until an
  * explicit aggregation.
  */
object TextAnalysis {

  /** Non-empty whitespace tokens. `split` can emit empty strings for
    * leading separators, so filter them — this matches "words" rather
    * than separator arithmetic.
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Mean token length = total token chars / token count (null on
    * empty documents rather than a divide-by-zero).
    */
  def avgTokenLength(text: Column): Column = {
    val toks = tokens(text)
    val total = aggregate(toks, lit(0),
      (acc, t) => acc + length(t)).cast("double")
    when(size(toks) > 0, total / size(toks))
  }

  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Fraction of tokens that are stopwords (lowercased exact match). */
  def stopwordRatio(text: Column,
                    stopwords: Seq[String] = defaultStopwords): Column = {
    val toks = tokens(text)
    val stops = array(stopwords.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stops, lower(t))))
    when(size(toks) > 0, nStop.cast("double") / size(toks))
  }

  /** Fraction of characters that are ASCII punctuation. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double")
        / length(text))

  /** Heuristic quality score in [0,1]: rewards reasonable length and a
    * natural (non-degenerate) stopword rate:
    * `0.5*min(n_tokens/100, 1) + 0.3*(1 - |stop_ratio - 0.4|) +
    *  0.2*(1 - punct_ratio)`.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    val stopScore = lit(1.0) - abs(coalesce(stopwordRatio(text), lit(0.0))
      - 0.4)
    val punctScore = lit(1.0) - coalesce(punctRatio(text), lit(0.0))
    lit(0.5) * lenScore + lit(0.3) * stopScore + lit(0.2) * punctScore
  }

  /** N-gram-free marker-word language ID: counts occurrences of a few
    * high-frequency marker words per language in the lowercased text
    * and returns the argmax language, `und` when no marker hits.
    * Counting is `(len(text) - len(replace(text, marker))) / len(marker)`
    * — pure string ops, no regex scan per marker.
    */
  /** Per-language character-trigram profiles (Cavnar & Trenkle
    * style): the highest-frequency trigrams of each language's
    * running text, space-padded so word boundaries are features
    * (`" th"` ≠ `"the"` ≠ `"he "`), rank-descending INTEGER weights
    * (24..1 — integers keep every dot product and norm exact in both
    * engines; see [[LangIdExpression]]). Orderings are standard
    * public letter-frequency knowledge; 24 trigrams per language is
    * the classic profile-prefix size regime (C&T used 300 of all
    * n-gram lengths; 24 trigrams is plenty at 4 languages).
    */
  val defaultTrigramProfiles: Seq[(String, Seq[(String, Int)])] = {
    def ranked(ts: Seq[String]): Seq[(String, Int)] =
      ts.zipWithIndex.map { case (t, i) => t -> (ts.length - i) }
    Seq(
      "en" -> ranked(Seq(
        " th", "the", "he ", "nd ", " an", "and", " of", "of ",
        "ed ", " in", "ing", "ng ", " to", "to ", "er ", "at ",
        "on ", "en ", " co", "es ", "is ", " be", "re ", "ion")),
      "es" -> ranked(Seq(
        " de", "de ", " la", "la ", "os ", " el", "el ", "en ",
        " en", "as ", "es ", " co", "ue ", " qu", "que", "nte",
        " se", "ar ", "ion", "cio", " pa", "ado", "del", "an ")),
      "fr" -> ranked(Seq(
        " de", "de ", "es ", "le ", " le", "ent", "nt ", "et ",
        " et", " la", "la ", "on ", "re ", "ion", " co", "e d",
        "ne ", "te ", "les", " pa", "que", " qu", "eur", "ant")),
      "de" -> ranked(Seq(
        "en ", "er ", "der", " de", "ie ", "die", " di", "ch ",
        "sch", "ein", " ei", "ung", "ng ", "und", " un", "ich",
        "cht", "ten", "te ", "ge ", " ge", "ber", "nde", "das")))
  }

  def langId(text: Column,
             profiles: Seq[(String, Seq[(String, Int)])] =
               defaultTrigramProfiles): Column =
    // native single-pass trigram-profile cosine (replaces the r3-r5
    // marker-word vote — r5 verdict item 3) — see [[LangIdExpression]]
    LangIdExpression.langId(text, profiles)

  /** BPE-ish subword token count: matches letter runs, digit runs, and
    * punctuation runs with an optional leading space (the GPT-2
    * pre-tokenizer shape, minus its RE2-incompatible lookahead so the
    * DuckDB oracle can reproduce the count with the same pattern).
    */
  val bpeishPattern = " ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"

  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(bpeishPattern))

  /** Pinned BPE merge table, priority order. Each entry merges the
    * space-separated symbol pair on the left into the single symbol on
    * the right, applied replace-all over the space-joined character
    * representation of one word — the standard fast application of a
    * learned merge list (Sennrich et al. 2016 reference
    * implementation applies merges the same way: per rank, all
    * occurrences). The table is a fixed literal so the DuckDB oracle
    * replays the identical chain and the segmentation is
    * engine-portable; a production run would substitute its learned
    * vocabulary, the plan shape is unchanged.
    */
  val defaultBpeMerges: Seq[(String, String)] = Seq(
    "t h" -> "th", "th e" -> "the", "i n" -> "in", "a n" -> "an",
    "r o" -> "ro", "ro w" -> "row", "o w" -> "ow", "v a" -> "va",
    "va l" -> "val", "val u" -> "valu", "valu e" -> "value",
    "s t" -> "st", "f a" -> "fa", "fa st" -> "fast",
    "e y" -> "ey", "k ey" -> "key")

  /** One word → its BPE piece count under `merges`: split to
    * space-joined characters, then fold the merge chain (each step one
    * codegen'd `replace`), then count remaining symbols. Pure per-row
    * string work — whole-stage codegen, zero exchange.
    */
  def bpePieceCount(word: Column,
                    merges: Seq[(String, String)] = defaultBpeMerges)
      : Column = {
    val chars = trim(regexp_replace(word, "(.)", "$1 "))
    val merged = merges.foldLeft(chars) { case (acc, (from, to)) =>
      call_function("replace", acc, lit(from), lit(to))
    }
    size(split(merged, " "))
  }

  /** Document fingerprint: md5 of the whitespace-normalized, lowercased
    * text. Identical content ⇒ identical fingerprint regardless of
    * spacing/case — the key for exact dedup.
    */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** Winnowing fingerprints (rolling-hash document signature): hash
    * every k-char-gram, then keep the minimum hash of each
    * w-gram window — the classic plagiarism/near-dup fingerprint set
    * (Schleimer et al., SIGMOD'03). md5-based so engines agree; the
    * distinct selected hashes form a compact, position-robust
    * signature. Array column of hex strings.
    *
    * Native single-pass expression: the nested-HOF formulation
    * (transform-over-grams inside transform-over-windows) re-evaluates
    * the captured gram pipeline per window element when interpreted —
    * O(n²) md5 calls per document. See [[WinnowingExpression]].
    */
  def winnowingFingerprints(text: Column, k: Int = 8,
                            w: Int = 4): Column =
    WinnowingExpression.winnowingFingerprints(text, k, w)

  /** Token-window chunks for training-data prep: windows of
    * `chunkSize` tokens starting every `step` tokens (overlap =
    * chunkSize - step), as an array of (chunk_idx, chunk_tokens)
    * structs — explode downstream for one row per chunk. The trailing
    * window may be shorter (documents don't pad). Empty documents
    * yield a single empty chunk; filter on token count upstream when
    * that's unwanted. Pure per-row column work — embarrassingly
    * parallel, no shuffle.
    */
  def tokenChunks(text: Column, chunkSize: Int = 64,
                  step: Int = 48): Column = {
    require(chunkSize > 0 && step > 0,
      s"tokenChunks: chunkSize=$chunkSize and step=$step must be > 0")
    require(step <= chunkSize,
      s"tokenChunks: step=$step > chunkSize=$chunkSize would silently " +
        "drop the tokens between consecutive windows")
    val toks = tokens(text)
    transform(
      sequence(lit(1), greatest(size(toks), lit(1)), lit(step)),
      s => struct(((s - 1) / step).cast("int").as("chunk_idx"),
        slice(toks, s, lit(chunkSize)).as("chunk_tokens")))
  }

  /** Gopher/C4-style repetition metrics as a struct — the "is this
    * document degenerate boilerplate" signals of a training-data
    * quality filter:
    *   - n_tokens
    *   - dup_token_frac: 1 - distinct/total tokens
    *   - dup_2gram_frac: 1 - distinct/total word bigrams
    *   - top_2gram_frac: tokens covered by the most frequent bigram
    *     (count x 2 / n_tokens; can exceed 1 for overlapping runs)
    * Fractions are rounded to 6 dp (portable across engines). The most
    * frequent bigram count is a sort + single-pass longest-run fold
    * over the row's own bigrams (equal values are adjacent after the
    * sort) — per-row column work only, no explode/shuffle, so the
    * operator stays embarrassingly parallel at corpus scale.
    */
  def repetitionStats(text: Column): Column = {
    import graft.functions.PortableRound.pround
    // one native pass ([[RepetitionStatsExpression]]); everything
    // below is cheap field arithmetic on the counters
    val c = RepetitionStatsExpression.repetitionCounts(text)
    val nTok = c.getField("n_tokens")
    val nBig = c.getField("n_bigrams")
    val dupTok = when(nTok > 0,
      pround(lit(1.0)
        - c.getField("n_distinct_tokens").cast("double") / nTok, 6))
      .otherwise(lit(0.0))
    val dup2 = when(nBig > 0,
      pround(lit(1.0)
        - c.getField("n_distinct_bigrams").cast("double") / nBig, 6))
      .otherwise(lit(0.0))
    val top2 = when(nTok >= 2,
      pround((c.getField("top_bigram_count") * 2).cast("double") / nTok, 6))
      .otherwise(lit(0.0))
    struct(nTok.as("n_tokens"),
      dupTok.as("dup_token_frac"),
      dup2.as("dup_2gram_frac"),
      top2.as("top_2gram_frac"),
      (dup2 <= 0.6 && top2 <= 0.3).as("keep"))
  }

  /** Word n-gram shingles (default 3) as an array column — input to
    * MinHash / Jaccard dedup.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))
  }
}

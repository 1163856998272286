package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation (SURVEY.md §2):
  * token counting, quality scoring, heuristic language ID, and
  * rolling-hash fingerprinting. All built-in expressions — the per-
  * document work is embarrassingly parallel and codegen'd.
  */
object TextAnalysis {

  /** Whitespace tokens (single-space corpus convention). */
  def wsTokens(text: Column): Column = split(text, " ")

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single
    * non-alphanumeric marks. */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpeishPattern), lit(0))

  /** Small multilingual stopword table for the heuristic scorer. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "en", "est", "que"),
    "de" -> Seq("der", "die", "das", "und", "in", "ein", "ist", "zu"))

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** (n_tokens, n_chars, avg_token_len, stopword_ratio) per doc —
    * the length/punct/stopword quality features. Tokens are
    * materialized once per row: the output expressions reference
    * them four times, and an inline split would re-tokenize per
    * reference (see the ngrams scaladoc in Dedup). */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = col("__toks")
    df.select(col(idCol), col(textCol),
        wsTokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        length(col(textCol)).as("n_chars"),
        size(toks).as("n_tokens"),
        round((length(col(textCol)) - (size(toks) - 1))
          .cast("double") / size(toks), 4).as("avg_token_len"),
        round(countIn(toks, stopwords("en")).cast("double") / size(toks), 4)
          .as("stopword_ratio"))
  }

  /** Heuristic language ID: argmax over per-language stopword hit
    * ratios; ties broken by language code. Returns (id, pred_lang,
    * score). */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // tokens and the argmax struct both materialized once per row —
    // the per-language scores reference the token array 8 times and
    // the winner struct is read twice
    val toks = col("__toks")
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(round(countIn(toks, words).cast("double") / size(toks), 6).as("score"),
        lit(lang).as("lang"))
    }
    df.select(col(idCol), wsTokens(col(textCol)).as("__toks"))
      .select(col(idCol), greatest(scored: _*).as("__best"))
      .select(col(idCol),
        col("__best").getField("lang").as("pred_lang"),
        col("__best").getField("score").as("score"))
  }

  /** Deterministic train/val/test assignment by content-independent
    * key hash — reproducible across runs, engines and data orders
    * (md5 of the key, split on the first two hex chars: 'cc' ≈ 80%,
    * 'e6' ≈ 90%). Join-free, map-side, and stable under corpus
    * growth: a document's split never changes when others arrive. */
  def assignSplit(idCol: Column, trainHex: String = "cc",
      valHex: String = "e6"): Column = {
    // md5 renders lowercase hex; an uppercase or malformed bound
    // would silently misclassify every row via string comparison
    require(trainHex.matches("[0-9a-f]{2}") && valHex.matches("[0-9a-f]{2}")
        && trainHex <= valHex,
      s"bounds must be two lowercase hex chars with train <= val, " +
        s"got ($trainHex, $valHex)")
    val h = substring(md5(idCol.cast("string")), 1, 2)
    when(h < trainHex, "train").when(h < valHex, "val").otherwise("test")
  }

  /** Fixed-size token-window chunking with overlap — the
    * context-window preparation step of a training-data pipeline.
    * Chunks start every `size - overlap` tokens; the last window is
    * the trailing remainder (never empty, never past the end). One
    * row per (doc, chunk) via posexplode; all map-side, no shuffle.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size)
    val step = size - overlap
    val toks = wsTokens(col(textCol))
    val nChunks = greatest(lit(1),
      ceil((size_(toks) - lit(overlap)).cast("double") / step).cast("int"))
    df.select(col(idCol), toks.as("toks"), nChunks.as("nc"))
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), col("nc") - 1),
        // count the slice directly rather than re-tokenizing the
        // joined string per output row
        i => struct(
          concat_ws(" ", slice(col("toks"), i * step + 1, lit(size)))
            .as("chunk_text"),
          size_(slice(col("toks"), i * step + 1, lit(size)))
            .as("n_tokens"))))
        .as(Seq("chunk_id", "c")))
      .select(col(idCol), col("chunk_id"), col("c.chunk_text"),
        col("c.n_tokens"))
  }

  private def size_(c: Column): Column = size(c)

  /** Order-sensitive rolling polynomial hash over the token-hash
    * sequence (multiplier 1000003, masked to 32 bits each step so
    * the multiply never overflows a long under ANSI mode) — the
    * document fingerprint. Distinguishes permuted documents, unlike
    * the bag-of-words fingerprint. Token hash = first 32 bits of
    * md5, a hash every SQL engine exposes, so the fingerprint is
    * reproducible cross-engine (xxhash64 is not portable). */
  def rollingFingerprint(text: Column): Column =
    aggregate(wsTokens(text), lit(0L),
      (acc, t) => (acc * 1000003L +
        conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
        .bitwiseAND(lit(0xFFFFFFFFL)))
}

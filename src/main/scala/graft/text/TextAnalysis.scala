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

  /** Token-distribution Shannon entropy per document — the
    * repetitiveness/diversity quality signal (low entropy = the doc
    * is a few tokens repeated; gibberish with unique tokens maxes at
    * log2(n)). Plan: one (doc, token) count shuffle + one per-doc
    * collect — both keyed on doc_id, so the second agg rides the
    * first's partitioning.
    *
    * Cross-engine exactness: floating-point summation is order-
    * dependent, so H is folded LEFT-TO-RIGHT over counts sorted by
    * token — both engines then execute the identical IEEE op
    * sequence and the doubles match bit-for-bit before the final
    * round(6) (the same discipline as the fingerprint fold). */
  def entropy(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(wsTokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("token"), col("c"))))
          .as("cs"),
        sum(col("c")).cast("double").as("n"))
      .select(col(idCol),
        col("n").cast("long").as("n_tokens"),
        size(col("cs")).as("n_distinct"),
        round(aggregate(col("cs"), lit(0.0), (acc, x) => {
          val p = x.getField("c").cast("double") / col("n")
          acc - p * log2(p)
        }), 6).as("entropy"))

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

  /** PII patterns, written in the regex subset Java and RE2 share
    * (char classes, bounded repeats, `\b`) so the DuckDB oracle runs
    * the SAME pattern strings. Matched spans are replaced by typed
    * placeholder tokens; counts are taken on the original text. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"
  val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII redaction: per-doc match counts + the scrubbed text.
    * Emails are removed first (their local parts can contain digit
    * runs), then phones, then IPs — a dotted phone has three number
    * groups and an IP four, so the patterns never claim each other's
    * spans and the counts are order-independent. Map-side only. */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val clean = regexp_replace(
      regexp_replace(
        regexp_replace(t, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipRe, "<IP>")
    df.select(col(idCol),
      regexp_count(t, lit(emailRe)).as("n_emails"),
      regexp_count(t, lit(phoneRe)).as("n_phones"),
      regexp_count(t, lit(ipRe)).as("n_ips"),
      clean.as("clean_text"))
  }

  /** Gopher-style repetition signals per document: over the doc's
    * word n-grams WITH multiplicity, the duplicate-gram fraction
    * (1 − distinct/total) and the share of the single most frequent
    * gram. Two shuffles — (doc, gram) then doc — both keyed on the
    * doc id, so at any scale the heavy first aggregation map-side
    * combines within a document's partition. (Dedup.ngrams is
    * distinct-ified for Jaccard and can't be reused here.) */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2): DataFrame = {
    require(n > 0)
    val toks = col("__toks")
    df.select(col(idCol), wsTokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", (0 until n)
          .map(j => try_element_at(toks, i + j + 1)): _*))).as("gram"))
      .groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(idCol))
      .agg(sum("__n").as("n_grams"),
        count(lit(1)).as("n_distinct"),
        round(lit(1.0) - count(lit(1)).cast("double") / sum("__n"), 4)
          .as("dup_frac"),
        round(max("__n").cast("double") / sum("__n"), 4).as("top_frac"))
  }

  /** Deterministic per-stratum Bernoulli sampling — the corpus-mixing
    * primitive (downweight a crawl source, upsample a quality tier).
    * Keep decision = 16-bit md5 prefix of the key vs a per-row rate:
    * content-independent, join-free, map-side, and stable under
    * corpus growth (a doc's fate never changes when others arrive).
    * Strata with rate ≥ 1 keep everything. */
  def sampleKeep(id: Column, rate: Column): Column = {
    // the cutoff renders as 4 lowercase hex digits, the same fixed
    // width as the md5 prefix, so string comparison IS numeric
    // comparison (and matches DuckDB's printf('%04x', …) exactly)
    val cutoff = format_string("%04x", floor(rate * 65536).cast("int"))
    when(rate >= 1.0, lit(true))
      .otherwise(substring(md5(id.cast("string")), 1, 4) < cutoff)
  }

  /** Token-budget corpus mixing: give every source the SAME target
    * token budget and downsample each to it — per-source whitespace
    * token totals, keep rate min(1, budget/total), then the
    * deterministic [[sampleKeep]] Bernoulli decision per document.
    * The standard mixture-rebalancing move (cap the dominant crawl
    * source, keep small curated sources whole); the realized sample
    * carries ≈ min(budget, total) tokens per source.
    *
    * Scale shape: one tiny per-source aggregate broadcast back over
    * the scan; the keep decision is map-side and content-independent,
    * so the mix is reproducible and stable under corpus growth. */
  def mixToBudget(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, budgetTokens: Long): DataFrame = {
    val toks = docs.select(col(idCol), col(sourceCol),
      size(wsTokens(col(textCol))).as("n_toks"))
    val rates = toks.groupBy(sourceCol)
      .agg(sum("n_toks").as("src_toks"))
      .select(col(sourceCol),
        least(lit(1.0),
          lit(budgetTokens).cast("double") / col("src_toks")).as("rate"))
    toks.join(broadcast(rates), sourceCol)
      .filter(sampleKeep(col(idCol), col("rate")))
      .select(col(idCol), col(sourceCol), col("n_toks"),
        round(col("rate"), 4).as("rate"))
  }

  /** Gopher-style rule-based document filtering (Rae et al. 2021
    * §A1.1, plus C4's alpha-word rule): per document, the five rule
    * features and their pass flags, and the overall keep decision —
    * the gate a curation pipeline runs before any expensive dedup.
    *   - token count within [minTokens, maxTokens]
    *   - mean token length within [3, 10]
    *   - fraction of tokens containing an alphabetic char ≥ 0.8
    *   - fraction of symbol-ish tokens (# or ellipsis) ≤ 0.1
    *   - at least 2 stopword hits
    * Features are rounded to 4 decimals BEFORE the threshold
    * comparison so the booleans are replayable cross-engine (a raw
    * double at the boundary could flip under reordered summation).
    * Entirely map-side — no shuffle, one scan, codegen'd. */
  /** Token-distribution drift between the train and val splits —
    * the pre-training check that a corpus refresh (or a buggy
    * curation change) did not shift what the model will see vs what
    * it is evaluated on. Per top-`topK` token: add-one-smoothed
    * rates on each side and their ratio; `drifted` flags tokens
    * whose rate moved by ≥ `ratioThreshold` either way. All
    * integer-count + rounded-division arithmetic — no logs — so the
    * result replays bit-exact in any engine. One explode + one
    * token-group aggregate (partial map-side) + a broadcast totals
    * row; top-K via TakeOrderedAndProject, never a full sort. */
  def tokenDrift(df: DataFrame, idCol: String, textCol: String,
      topK: Int = 200, ratioThreshold: Double = 2.0): DataFrame = {
    val toks = df.select(assignSplit(col(idCol)).as("split"),
        explode(wsTokens(col(textCol))).as("token"))
      .filter(col("split") =!= "test")
    val counts = toks.groupBy("token").agg(
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
      sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"))
    val totals = counts.agg(sum("n_train").as("tot_train"),
      sum("n_val").as("tot_val"))
    val top = counts
      .orderBy((col("n_train") + col("n_val")).desc, col("token"))
      .limit(topK)
    val p = round((col("n_train") + 1).cast("double") /
      (col("tot_train") + topK), 6)
    val q = round((col("n_val") + 1).cast("double") /
      (col("tot_val") + topK), 6)
    // denominator floored at the rounding quantum: past ~2M val-side
    // tokens a rare token's 6-dp rate rounds to exactly 0.0 and an
    // unguarded quotient is Infinity — which DuckDB renders
    // differently, breaking the bit-exact cross-engine contract
    top.crossJoin(broadcast(totals))
      .select(col("token"), col("n_train"), col("n_val"),
        p.as("p_train"), q.as("p_val"),
        round(p / greatest(q, lit(1e-6)), 4).as("ratio"))
      .withColumn("drifted", col("ratio") >= ratioThreshold ||
        col("ratio") <= 1.0 / ratioThreshold)
      .orderBy("token")
  }

  /** FUSED one-pass corpus curation — quality features + Gopher
    * gate + language ID + deterministic split + exact-dup
    * canonicalization in a single plan: ONE scan of the corpus and
    * ONE shuffle (the dedup fingerprint window, carrying only the
    * narrow feature row — the text column is dropped before the
    * exchange). Running [[quality]], [[gopherRules]], [[langId]],
    * [[assignSplit]] and `Dedup.exactGroups` separately costs four
    * corpus scans plus a shuffle; at 100 TB the scans ARE the
    * pipeline cost, so fusing them is not a convenience but the
    * difference between one pass over object storage and five.
    * Every output column is bit-identical to its standalone
    * operator (pinned in CurationSpec): the token array is
    * materialized once per row and every feature reads it.
    *
    * `keep` = Gopher rules pass ∧ predicted language is `lang` ∧
    * the doc is its duplicate group's canonical (min-id) copy.
    */
  def curate(df: DataFrame, idCol: String, textCol: String,
      lang: String = "en", minTokens: Int = 50,
      maxTokens: Int = 100000): DataFrame = {
    val toks = col("__toks")
    val n = size(toks)
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lg, words) =>
      struct(round(countIn(toks, words).cast("double") / n, 6).as("score"),
        lit(lg).as("lang"))
    }
    val feats = df
      .select(col(idCol), col(textCol), wsTokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        graft.dedup.Dedup.bowFingerprint(col(textCol)).as("__fp"),
        length(col(textCol)).as("n_chars"),
        n.cast("long").as("n_tokens"),
        round((length(col(textCol)) - (n - 1)).cast("double") / n, 4)
          .as("avg_token_len"),
        round(countIn(toks, stopwords("en")).cast("double") / n, 4)
          .as("stopword_ratio"),
        round(size(filter(toks, t => t.rlike("[A-Za-z]")))
          .cast("double") / n, 4).as("alpha_frac"),
        round(size(filter(toks, t => t.contains("#") || t.contains("...")))
          .cast("double") / n, 4).as("symbol_frac"),
        countIn(toks, stopwords("en")).cast("long").as("__stop_hits"),
        greatest(scored: _*).as("__best"),
        assignSplit(col(idCol)).as("split"))
    // the only exchange: hash-partition the NARROW feature rows by
    // content fingerprint; min/count need no ordered frame
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__fp")
    feats
      .withColumn("keeper", min(col(idCol)).over(w))
      .withColumn("n_copies", count(lit(1)).over(w))
      .withColumn("pred_lang", col("__best").getField("lang"))
      .withColumn("quality_keep",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens &&
          col("avg_token_len") >= 3.0 && col("avg_token_len") <= 10.0 &&
          col("alpha_frac") >= 0.8 && col("symbol_frac") <= 0.1 &&
          col("__stop_hits") >= 2L)
      .withColumn("keep", col("quality_keep") &&
        col("pred_lang") === lang && col(idCol) === col("keeper"))
      .drop("__fp", "__stop_hits", "__best")
  }

  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 50, maxTokens: Int = 100000): DataFrame = {
    val toks = col("__toks")
    val n = size(toks)
    df.select(col(idCol), col(textCol), wsTokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        n.cast("long").as("n_tokens"),
        // mean token length via total chars minus separators — the
        // same engine-exact formula as quality()'s avg_token_len
        round((length(col(textCol)) - (n - 1)).cast("double") / n, 4)
          .as("mean_token_len"),
        round(size(filter(toks, t => t.rlike("[A-Za-z]")))
          .cast("double") / n, 4).as("alpha_frac"),
        round(size(filter(toks, t => t.contains("#") || t.contains("...")))
          .cast("double") / n, 4).as("symbol_frac"),
        countIn(toks, stopwords("en")).cast("long").as("stop_hits"))
      .withColumn("ok_len",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .withColumn("ok_mean_len",
        col("mean_token_len") >= 3.0 && col("mean_token_len") <= 10.0)
      .withColumn("ok_alpha", col("alpha_frac") >= 0.8)
      .withColumn("ok_symbol", col("symbol_frac") <= 0.1)
      .withColumn("ok_stop", col("stop_hits") >= 2L)
      .withColumn("keep", col("ok_len") && col("ok_mean_len") &&
        col("ok_alpha") && col("ok_symbol") && col("ok_stop"))
  }

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken 2003,
    * the MOSS algorithm): hash every k-token gram, slide a w-gram
    * window, and keep each window's minimum hash (ties → rightmost).
    * Guarantees: every shared run of w+k−1 tokens between two
    * documents yields at least one shared fingerprint, and the
    * selected density is ~2/(w+1) — the classic local, position-
    * robust alternative to [[rollingFingerprint]]'s whole-document
    * hash. Documents shorter than k tokens have no gram and drop
    * out; documents with fewer than w grams contribute their single
    * (partial) trailing window, per the paper's boundary convention.
    *
    * Cross-engine determinism: gram hash = first 32 md5 bits (the
    * same portable token hash as [[rollingFingerprint]]); the
    * min-with-rightmost-tie-break is ENCODED into one integer —
    * `hash·2^21 + (2^20 − pos)` — so a plain window `min` resolves
    * both criteria at once and decodes exactly in any engine
    * (positions are required < 2^20; a 1M-token document at k=3
    * would overflow the encoding, fail loudly, not silently).
    *
    * Scale shape: gram hashing is map-side; the ONLY shuffle is the
    * per-document window (same doc-id partitioning every per-doc
    * text operator here uses); fingerprints emerge deduplicated by
    * a per-doc distinct that rides the same partitioning. */
  def winnow(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got ($k, $w)")
    val toks = col("__toks")
    val grams = df
      .select(col(idCol), wsTokens(col(textCol)).as("__toks"))
      .filter(size(toks) >= k)
      .select(col(idCol), posexplode(transform(
          sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
        .as(Seq("pos", "gram")))
    val ghash = conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long")
    val wf = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(-(w - 1), 0)
    val wd = Window.partitionBy(idCol)
    // the promised loud overflow failure: a pos ≥ 2^20 would silently
    // corrupt the tie-break encoding, so it errors instead; the guard
    // feeds the encoding itself, so column pruning can't drop it
    val checkedPos = when(col("pos") < 1048576L, col("pos"))
      .otherwise(raise_error(concat(
        lit("winnow: gram position overflows the 2^20 encoding: "),
        col("pos").cast("string"))))
    grams
      .select(col(idCol), col("pos"),
        (ghash * 2097152L + (lit(1048576L) - checkedPos)).as("comb"))
      .select(col(idCol),
        min(col("comb")).over(wf).as("m"),
        count(lit(1)).over(wf).as("cnt"),
        count(lit(1)).over(wd).as("total"))
      .filter(col("cnt") === least(lit(w.toLong), col("total")))
      // 2097152 = 2^21, so the hash half decodes as an exact shift
      // (long `/` would go through double division, whose rounding at
      // the r=1 boundary sits exactly on a half-ulp)
      .select(col(idCol), (lit(1048576L) - col("m") % 2097152L).as("pos"),
        call_function("shiftright", col("m"), lit(21)).as("fp"))
      .distinct()
      .orderBy(col(idCol), col("pos"))
  }

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

  /** Top TF-IDF terms per document — the classic keyword/feature
    * extraction (salton term weighting), complementing BM25 (which
    * ranks DOCS for a query; this ranks TERMS for a doc). tf from
    * one (doc, token) count shuffle, df from a token-type-sized
    * count, idf = ln(N/df) joined back un-hinted (AQE broadcasts the
    * vocabulary-sized frame), per-doc top-k by ROUNDED score so the
    * rank cut breaks ties identically in any engine (the linkpredict
    * convention; ln is libm on both engines — the round(6) absorbs
    * last-ulp drift, the same contract the perplexity oracles pass
    * under). */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(col(idCol), explode(wsTokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("token"))
    tf.join(docFreq, "token")
      .crossJoin(broadcast(n))
      .select(col(idCol), col("token"), col("tf"),
        round(col("tf") *
          log(col("n_docs").cast("double") / col("df").cast("double")), 6)
          .as("score"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** fastText-style hashed linear quality classifier: each token
    * hashes to a weight in [−1, 1] (2001 integer steps derived from
    * md5 — the stand-in for a trained embedding-average + linear
    * head; swap `weightOf` for a broadcast learned table and nothing
    * else changes), the document score is the mean token weight, and
    * the label thresholds at 0. This is the plumbing shape of every
    * production quality classifier (hash features → weight lookup →
    * mean → threshold): one scan, map-side only, no shuffle.
    *
    * Determinism contract: per-token weights are INTEGER numerators
    * (−1000..1000) summed exactly in a long fold (token order cannot
    * perturb an integer sum), and the single IEEE division at the
    * end runs on identical operands in any engine — which is what
    * makes the float score exactly oracle-checkable. */
  def linearClassify(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val toks = wsTokens(col(textCol))
    // first 8 md5 hex digits < 2^32, so the long is nonnegative and
    // % matches SQL's modulo on both engines
    val wsum = aggregate(toks, lit(0L),
      (acc, t) => acc +
        conv(substring(md5(concat(lit("w|"), t)), 1, 8), 16, 10)
          .cast("long") % 2001L - 1000L)
    df.select(col(idCol), size(toks).as("n_tokens"),
        wsum.as("wsum"))
      .select(col(idCol), col("n_tokens"),
        round(col("wsum").cast("double") /
          (col("n_tokens").cast("double") * 1000.0), 6).as("score"))
      .withColumn("label",
        when(col("score") > 0, lit("keep")).otherwise(lit("drop")))
  }
}

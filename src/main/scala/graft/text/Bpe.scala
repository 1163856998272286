package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich, Haddow & Birch 2016)
  * — the tokenizer-training primitive of an LLM data pipeline.
  *
  * Scale shape — the standard BPE formulation is exactly a two-tier
  * job, and this implements it that way:
  *  1. DISTRIBUTED: the word-frequency table (one explode + one
  *     shuffle over the corpus). This is the only pass that sees the
  *     data; 100 TB of text affects nothing else.
  *  2. BOUNDED: the merge loop runs on the collected (word, freq)
  *     MODEL — and the collect itself is HARD-BOUNDED, not merely
  *     Heaps'-law-hopeful. Raw web text has a heavy tail of
  *     one-off types (URLs, hex blobs, typos) that can push the
  *     distinct-token count to 10^8–10^9; the driver never sees it:
  *     a `minCount` floor drops singletons map-side and a `vocabCap`
  *     top-N (count DESC, word ASC — a distributed
  *     TakeOrderedAndProject, executors keep N rows each) caps what
  *     ships. The driver holds ≤ vocabCap (word, freq) rows —
  *     ≤ ~60 MB at the 1M default — the same model-sized-collect
  *     contract as the IVF/PQ codebooks and the ≤2M union-find
  *     bound in Dedup.resolveClusters. The truncation is the
  *     standard BPE trainer practice (HF tokenizers / sentencepiece
  *     both floor rare types): a type below the cap cannot win a
  *     merge argmax against the head of a Zipfian vocabulary, so
  *     the learned table is unchanged for any realistic nMerges;
  *     at the driver gate corpus the vocabulary is far below both
  *     bounds and the cap is the identity.
  *
  * Determinism: the best pair each step is (count DESC, left ASC,
  * right ASC) — a total order, so the merge table is a pure function
  * of the corpus bag of words. Merges apply left-to-right,
  * non-overlapping, all occurrences at once (the canonical rule).
  * The learned table is the model artifact; applying it to text is a
  * map-side longest-match pass.
  *
  * The query is exact at the driver gate (the greedy chain is
  * replayed in DuckDB as chained CTE stages — LlmQueries.bpeWithChain);
  * BpeSpec pins hand-computed merges on a toy corpus and the
  * monotone best-count invariant.
  */
object Bpe {

  /** End-of-word sentinel, the Sennrich formulation (lets a suffix
    * merge differently from the same chars mid-word). */
  private val Eow = "</w>"

  /** Learn `nMerges` merges from the corpus; returns one row per
    * merge step: (step, left, right, pair_count, merged).
    *
    * `vocabCap` / `minCount` bound the driver collect (see the
    * class doc): at most `vocabCap` (word, freq) rows ever reach
    * the driver, selected by (freq DESC, word ASC) so the
    * truncation itself is deterministic. Defaults are the identity
    * at gate scale and a hard OOM guard at corpus scale. */
  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int,
      vocabCap: Int = 1000000, minCount: Long = 1L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // tier 1: the one distributed pass — word frequencies, floored
    // then top-N'd BEFORE the collect (TakeOrderedAndProject: each
    // executor retains ≤ vocabCap rows, the driver merges heads).
    val wf = docs
      .select(explode(TextAnalysis.wsTokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("w").asc)
      .limit(vocabCap + 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      match {
        case full if full.length > vocabCap =>
          // the cap is an OOM guard, not a modeling choice — when it
          // actually truncates, say so (repo no-silent-caps
          // convention, r8 ADVICE): pair counts from the dropped
          // tail types are lost and the learned merge table can
          // change, which an operator must be able to see
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"BPE vocabCap=$vocabCap truncated the collected " +
              "vocabulary (corpus has more word types); merges are " +
              "learned from the head only — raise vocabCap if the " +
              "tail matters")
          full.take(vocabCap)
        case full => full
      }
    // tier 2: the merge loop on the vocabulary-sized model
    var words: Array[(Array[String], Long)] = wf.map { case (w, n) =>
      ((w.map(_.toString) :+ Eow).toArray, n)
    }
    val out = Vector.newBuilder[(Int, String, String, Long, String)]
    var step = 1
    var done = false
    while (step <= nMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Array[Long]]()
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          val c = counts.get(k)
          if (c == null) counts.put(k, Array(n)) else c(0) += n
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var best: ((String, String), Long) = null
        counts.forEach { (k, v) =>
          if (best == null || v(0) > best._2 ||
            (v(0) == best._2 && (k._1 < best._1._1 ||
              (k._1 == best._1._1 && k._2 < best._1._2))))
            best = (k, v(0))
        }
        val ((l, r), c) = best
        val merged = l + r
        out += ((step, l, r, c, merged))
        words = words.map { case (syms, n) =>
          if (syms.length < 2) (syms, n)
          else {
            val b = Array.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                b += merged; i += 2 // left-to-right, non-overlapping
              } else { b += syms(i); i += 1 }
            }
            (b.result(), n)
          }
        }
        step += 1
      }
    }
    out.result().toDF("step", "left", "right", "pair_count", "merged")
  }

  /** Apply a learned merge table: per document, tokenize each word
    * by replaying the merges IN LEARNED ORDER (Sennrich's apply
    * rule — same left-to-right, non-overlapping, all-occurrences
    * semantics as training, so encoding the training corpus
    * reproduces training's final symbol sequences exactly).
    *
    * Map-side only: the merge table is a broadcast model (vocab
    * bounded — the same artifact class as IVF centroids) and each
    * partition memoizes per-word encodings, so the per-row cost is
    * ~one hash probe per repeated word. Emits per-doc token
    * accounting (word count, BPE token count) — the number a
    * context-window packer or a tokens-per-doc budget gate consumes. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toArray)
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ms = bc.value
        val cache = new java.util.HashMap[String, Integer]()
        def encodeWord(w: String): Int = {
          val hit = cache.get(w)
          if (hit != null) hit.intValue()
          else {
            var syms: Array[String] = (w.map(_.toString) :+ Eow).toArray
            ms.foreach { case (l, r) =>
              if (syms.length >= 2) {
                val b = Array.newBuilder[String]
                var i = 0
                while (i < syms.length) {
                  if (i < syms.length - 1 && syms(i) == l &&
                    syms(i + 1) == r) {
                    b += (l + r); i += 2
                  } else { b += syms(i); i += 1 }
                }
                syms = b.result()
              }
            }
            cache.put(w, syms.length)
            syms.length
          }
        }
        it.map { case (id, text) =>
          val words = text.split(" ").filter(_.nonEmpty)
          var total = 0L
          words.foreach(w => total += encodeWord(w))
          (id, words.length.toLong, total)
        }
      }.toDF("doc_id", "n_words", "n_bpe_tokens")
  }
}

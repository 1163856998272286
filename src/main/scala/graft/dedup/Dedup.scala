package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family for document corpora (SURVEY.md §2
  * "LLM-training-data pipeline"). Everything is built from
  * codegen'd built-in higher-order functions — no UDFs — so the
  * whole pipeline stays inside WholeStageCodegen and scales by
  * partitioning alone:
  *
  *  - exact: hash-groupBy on a normalized content fingerprint;
  *  - MinHash+LSH: shingle → k minhashes → banded bucket join —
  *    the only shuffle is the band-bucket groupBy, never an n² join;
  *  - SimHash: 64-bit sign-aggregated token-hash fingerprint;
  *  - exact n-gram Jaccard for candidate-pair verification.
  */
object Dedup {

  /** Corpora up to this many documents broadcast their token sets
    * into the MinHash verification joins; above it they shuffle.
    * Sized for ~2 KB of sorted tokens per document → ≈200 MB
    * broadcast at the limit; row count is the cheap proxy (an exact
    * byte estimate would need a second pass over the text). */
  val setsBroadcastLimit = 100000L

  def tokens(text: Column): Column = split(text, " ")

  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Bag-of-words content fingerprint: md5 of the sorted distinct
    * token set. Exact dedup = groupBy on this. */
  def bowFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(tokenSet(text))))

  /** Exact-duplicate groups: fingerprint → (n_copies, keeper id). */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(bowFingerprint(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keeper"))

  /** Word n-grams (default 3) as space-joined strings. Documents
    * shorter than n yield their single truncated gram (try_element_at:
    * under ANSI mode a plain element_at throws past the end). */
  def ngrams(toks: Column, n: Int = 3): Column =
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", (0 until n).map(j => try_element_at(toks, i + j + 1)): _*)))

  /** Exact Jaccard similarity of two string sets. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** k MinHash values over a shingle set in one native pass (one
    * byte-hash per shingle + k long re-hashes). Map-side only. */
  def minhashSignature(shingles: Column, k: Int): Column =
    graft.functions.Registry.minhashSig(shingles, lit(k))

  /** Banded LSH bucket hashes: `b` bands of `r` signature rows each,
    * as an array of per-band bucket ids (index = band). */
  def lshBands(sig: Column, b: Int, r: Int): Column =
    transform(sequence(lit(0), lit(b - 1)),
      j => xxhash64(concat_ws(",", slice(sig, j * r + 1, lit(r))), j))

  /** MinHash-LSH candidate pairs with exact-Jaccard verification.
    *
    * Shuffles: one groupBy on (band, bucket) realized as a
    * self-join, then the verification join back to the shingle
    * sets. The bucket join's fan-in is bounded by the LSH bands —
    * at 100 TB the candidate set stays ~linear in true near-dups,
    * never the n² cross product.
    */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, numHashes: Int = 30, bands: Int = 6): DataFrame = {
    graft.functions.Registry.registerAll(docs.sparkSession)
    val r = numHashes / bands
    // Band geometry r=5/b=6: P(candidate | J=0.8) ≈ 0.91, and the
    // mid-similarity false-candidate mass (J≈0.6) drops ~2× vs
    // r=4/b=8 — candidate volume, not verification arithmetic,
    // dominates this operator's cost. (An ALLOCATING first-matching-
    // band filter — slice/zip_with per pair — benched 4× slower than
    // distinct(); the scalar when-chain below beats both.)
    // Token sets are pre-hashed to longs (Spark's builtin xxhash64 =
    // the signature expression's seed-42 base hash, so signatures are
    // bit-identical to hashing the strings): long merge walks verify
    // ~10× cheaper than string walks, and the rows flowing into the
    // verification join shrink by the same factor. Materialized once
    // (localCheckpoint): the frame is read three times (signatures +
    // both verification sides) and its row count drives the broadcast
    // decision — without it each use, count included, would re-run
    // the whole upstream pipeline.
    val withSets = docs.select(col(idCol).as("id"),
      array_sort(transform(tokenSet(col(textCol)), t => xxhash64(t))).as("sh"))
      .localCheckpoint()
    val sigs = withSets
      .withColumn("ba", lshBands(minhashSignature(col("sh"), numHashes), bands, r))
      .select(col("id"), size(col("sh")).as("sz"), col("ba"),
        posexplode(col("ba")).as(Seq("band", "bucket")))
    // emit each pair only from its FIRST matching band — a pure
    // scalar when-chain over the band arrays (no per-pair allocation,
    // unlike the slice/zip_with variant that benched 4× slower), so
    // no distinct() shuffle is needed: high-J pairs match most bands
    // and the raw join stream is ~3× the unique pair count
    val firstMatch = (1 until bands).foldLeft(
        when(col("x.band") === 0, lit(true))) { (acc, k) =>
      acc.when(col("x.band") === k,
        (0 until k).map(i => col("x.ba")(i) =!= col("y.ba")(i))
          .reduce(_ && _))
    }.otherwise(lit(false))
    val cands = sigs.as("x").join(sigs.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      // size-ratio guard (J ≥ t ⇒ min/max sizes ≥ t): scalar-only,
      // kills impossible pairs before verification
      .filter(least(col("x.sz"), col("y.sz")).cast("double")
        / greatest(col("x.sz"), col("y.sz")) >= threshold)
      .filter(firstMatch)
      .select(col("x.id").as("a"), col("y.id").as("b"))
    // broadcast the token sets only while the corpus is small enough
    // — at 100 TB the verification joins must shuffle on id instead
    val sets =
      if (withSets.count() <= setsBroadcastLimit) broadcast(withSets)
      else withSets
    cands
      .join(sets.select(col("id").as("a"), col("sh").as("sha")), "a")
      .join(sets.select(col("id").as("b"), col("sh").as("shb")), "b")
      .select(col("a"), col("b"),
        round(graft.functions.Registry.jaccardSorted(col("sha"), col("shb")), 4)
          .as("j"))
      .filter(col("j") >= threshold)
  }

  /** Resolve near-dup PAIRS into dedup decisions: connected
    * components over the pair graph (transitive closure — if a≈b
    * and b≈c, all three are one cluster), keeper = the smallest id
    * of each cluster, like the reference-style canonical addressing
    * and exactGroups' min-id keeper. Returns every clustered doc as
    * (id, keeper); docs in no pair are implicitly their own keeper.
    * Adaptive: union-find on the driver while the pair list fits
    * (it is the distilled near-dup output, and dup clusters are
    * near-cliques — the worst case for label propagation);
    * distributed min-label CC past `driverLimit`. Both pick the
    * min-id keeper and never materialize the transitive closure.
    * The 2M default is measured against both failure modes: an
    * 8×-scale corpus whose pair list crossed a 1M limit spent ~70 s
    * in the distributed fixpoint for an answer the driver gives in
    * seconds, while the driver side costs roughly the deserialized
    * rows plus a boxed union-find map — ~hundreds of MB at 2M
    * string-id pairs, safe beyond Spark's default 1g driver but not
    * by an order of magnitude. Long-id pipelines on a sized driver
    * (this library's mains run 48g) can raise it to 5-10M and win
    * every time the collect fits. */
  def resolveClusters(pairs: DataFrame, aCol: String = "a",
      bCol: String = "b", driverLimit: Long = 2000000L): DataFrame = {
    val spark = pairs.sparkSession
    // ids keep their input type: casting Long ids to string would
    // elect "10" over "2" as keeper (lexicographic ≠ numeric min)
    val idType = pairs.schema(aCol).dataType
    require(pairs.schema(bCol).dataType == idType,
      s"pair columns must share one type, got $idType vs " +
        pairs.schema(bCol).dataType)
    // checkpoint: the input is typically an expensive pipeline and
    // is read again below (count + collect, or count + self-union)
    val und = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .localCheckpoint()
    // the pair list is the DISTILLED near-dup output — usually orders
    // of magnitude smaller than the corpus, and near-clique (dup
    // clusters are dense), which is the worst case for iterative
    // label propagation. Under the limit, union-find on the driver
    // resolves millions of pairs in one pass; past it, fall back to
    // the distributed fixpoint.
    if (und.count() <= driverLimit) {
      import org.apache.spark.sql.types._
      implicit val ord: Ordering[Any] = (idType match {
        case LongType | IntegerType | ShortType | ByteType =>
          Ordering.by((x: Any) => x.asInstanceOf[Number].longValue)
        case DoubleType | FloatType =>
          Ordering.by((x: Any) => x.asInstanceOf[Number].doubleValue)
        case _: DecimalType =>
          Ordering.by((x: Any) => x.asInstanceOf[java.math.BigDecimal])
        case StringType =>
          // Spark's min() orders strings by UTF-8 bytes; JVM string
          // compare is UTF-16 and disagrees on supplementary chars —
          // both paths must elect the same keeper
          Ordering.comparatorToOrdering(
            java.util.Comparator.comparing((x: Any) =>
              org.apache.spark.unsafe.types.UTF8String
                .fromString(x.asInstanceOf[String])))
        case other => throw new IllegalArgumentException(
          s"unsupported id type for cluster resolution: $other")
      })
      val parent = scala.collection.mutable.HashMap.empty[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val next = parent(c); parent(c) = r; c = next
        }
        r
      }
      und.collect().foreach { row =>
        val (a, b) = (row.get(0), row.get(1))
        // register both ends so self-pairs still emit their node
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        // union by min id so every root is its cluster's keeper
        if (ra != rb) {
          if (ord.lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
        }
      }
      val rows = parent.keySet.toSeq
        .map(n => org.apache.spark.sql.Row(n, find(n)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node", idType),
          org.apache.spark.sql.types.StructField("keeper", idType))))
    } else
      graft.graph.Algorithms.connectedComponents(
          und.unionByName(und.select(col("b").as("a"), col("a").as("b")))
            .distinct())
        .withColumnRenamed("component", "keeper")
  }

  /** Train/eval contamination check (decontamination): for every
    * doc NOT in the train split, count its distinct word n-grams
    * that appear in ANY train-split document — the overlap detector
    * run before an eval set is trusted. Only docs with ≥ n tokens
    * participate (a shorter doc has no full n-gram).
    *
    * Scale shape: explode to distinct grams per doc, distinct the
    * train side, and semi-join on the gram — one shuffle each side,
    * output rows only for genuinely contaminated docs. At 100 TB
    * you would join on xxhash64(gram) to shrink the exchange; the
    * string key is kept here so the result is oracle-checkable
    * verbatim in any engine. */
  def crossSplitContamination(docs: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame = {
    val toks = tokens(col(textCol))
    // checkpoint: both split filters read this frame, and the
    // tokenize + gram explode is the dominant cost — uncheckpointed
    // it would run twice (same pattern as minhashNearDups)
    val withGrams = docs
      .filter(size(toks) >= n)
      .select(col(idCol).as("doc_id"),
        graft.text.TextAnalysis.assignSplit(col(idCol)).as("split"),
        explode(ngrams(toks, n)).as("gram"))
      .localCheckpoint()
    val trainGrams = withGrams.filter(col("split") === "train")
      .select("gram").distinct()
    withGrams.filter(col("split") =!= "train")
      .join(trainGrams, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** 64-bit SimHash over the token multiset: bit b of the result is
    * set iff more token-hashes (xxhash64, seed 42) have bit b set
    * than clear. Native single-pass expression. */
  def simhash64(toks: Column): Column =
    graft.functions.Registry.simhash(toks)

  /** SimHash near-dup pairs: band the 64-bit fingerprint into four
    * 16-bit blocks; a pair is a candidate iff some block matches
    * exactly, then candidates are verified by true hamming distance
    * ≤ maxHamming. By pigeonhole the block match GUARANTEES recall
    * for hamming ≤ 3; beyond that recall is heuristic (bits of real
    * near-dups cluster, so most small-distance pairs still share a
    * block — pinned empirically in DedupSpec). Narrower blocks would
    * extend the guarantee but blow up bucket sizes (8-bit blocks =
    * 256 buckets/band → ~n²/256 candidate pairs per band). */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 8): DataFrame = {
    graft.functions.Registry.registerAll(docs.sparkSession)
    val withSim = docs.select(col(idCol).as("id"),
      simhash64(tokens(col(textCol))).as("sim"))
    val banded = withSim.select(col("id"), col("sim"),
        explode(transform(sequence(lit(0), lit(3)),
          j => struct(j.as("band"),
            call_function("shiftright", col("sim"), lit(16) * j.cast("int"))
              .bitwiseAND(lit(0xFFFFL)).as("block")))).as("bb"))
      .select(col("id"), col("sim"), col("bb.band"), col("bb.block"))
    val hamming = {
      val x = col("x.sim").bitwiseXOR(col("y.sim"))
      bit_count(x)
    }
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.block") === col("y.block") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        hamming.as("hamming")).distinct()
      .filter(col("hamming") <= maxHamming)
  }
}

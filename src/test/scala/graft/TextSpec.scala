package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextAnalysis

class TextSpec extends AnyFunSuite with SparkFixture {

  test("space-saving heavy hitters: exact in no-eviction regime, " +
      "bounded in eviction regime") {
    import spark.implicits._
    // skewed stream: token "hot" ×60, "warm" ×20, then 40 singletons
    val toks = Seq.fill(60)("hot") ++ Seq.fill(20)("warm") ++
      (1 to 40).map(i => f"rare$i%02d")
    val docs = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // capacity ≥ distinct: provably exact, err_bound 0
    val wide = text.HeavyHitters.topTokens(docs, "text", k = 5,
        capacity = 1024)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(wide.forall(_._3 == 0L))
    assert(wide.take(2).map(t => t._1 -> t._2).toSeq ==
      Seq("hot" -> 60L, "warm" -> 20L))
    // capacity 8 ≪ 42 distinct: estimates overcount by ≤ err_bound,
    // and the dominant token (count > N/capacity) must survive
    val tight = text.HeavyHitters.topTokens(docs, "text", k = 8,
        capacity = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    tight.foreach { case (tok, est, err) =>
      val truth = exact.getOrElse(tok, 0L)
      assert(truth <= est && est - err <= truth,
        s"$tok est=$est err=$err true=$truth")
    }
    assert(tight.head._1 == "hot" && tight.head._2 >= 60L)
  }

  test("space-saving bound holds across partitions in the eviction " +
      "regime (floor-credited merge)") {
    import spark.implicits._
    // tokens spread over 4 partitions so some partitions evict a
    // token other partitions keep — the regime where a plain
    // per-token sum undercounts (the merge must credit each absent
    // partition's eviction floor)
    val toks = Seq.tabulate(400) { i =>
      if (i % 4 == 0) "hot"
      else if (i % 7 == 0) "warm"
      else f"rare${i}%03d"
    }
    val docs = toks.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .repartition(4)
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = text.HeavyHitters.topTokens(docs, "text", k = 12,
        capacity = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (tok, est, err) =>
      val truth = exact.getOrElse(tok, 0L)
      assert(truth <= est, s"$tok overcredit: est=$est true=$truth")
      assert(est - err <= truth,
        s"$tok undercount: est=$est err=$err true=$truth")
    }
    // the dominant token must survive and keep a sane estimate
    assert(got.exists(_._1 == "hot"))
    val hot = got.find(_._1 == "hot").get
    assert(hot._2 >= exact("hot"))
  }

  test("bpe merges match the hand-computed sequence on the Sennrich corpus") {
    import spark.implicits._
    // 5×low 2×lower 6×newest 3×widest — the BPE paper's worked example
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val merges = text.Bpe.learnMerges(docs, "text", nMerges = 5)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4)))
    // ties at count 9 break (left, right) lexicographically: e<s<t
    assert(merges.toSeq == Seq(
      (1, "e", "s", 9L, "es"),
      (2, "es", "t", 9L, "est"),
      (3, "est", "</w>", 9L, "est</w>"),
      (4, "l", "o", 7L, "lo"),
      (5, "lo", "w", 7L, "low")), merges.mkString(", "))
  }

  test("bpe vocab cap and min-count floor bound the driver collect " +
      "deterministically") {
    import spark.implicits._
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest") ++ Seq("zebra")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    // defaults are the identity: same table as the uncapped call
    val full = text.Bpe.learnMerges(docs, "text", nMerges = 5)
      .orderBy("step").collect().map(_.toSeq).toSeq
    val dflt = text.Bpe.learnMerges(docs, "text", nMerges = 5,
      vocabCap = 1000000, minCount = 1L)
      .orderBy("step").collect().map(_.toSeq).toSeq
    assert(full == dflt)
    // minCount=2 drops the singleton type "zebra" → identical to
    // training on the Sennrich corpus without it
    val floored = text.Bpe.learnMerges(docs, "text", nMerges = 5,
      minCount = 2L).orderBy("step").collect().map(_.toSeq).toSeq
    assert(floored == full, "singleton type must not affect merges")
    // vocabCap=2 keeps only (newest×6, low×5): merges come from
    // those two types alone — hand-computed head: (e,s)=6 wins first
    val capped = text.Bpe.learnMerges(docs, "text", nMerges = 2,
      vocabCap = 2).orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(capped.head == (("e", "s", 6L)), capped.mkString(", "))
  }

  test("bpe encode replays learned merges in order, hand-computed") {
    import spark.implicits._
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val train = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val merges = text.Bpe.learnMerges(train, "text", nMerges = 5)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // hand-encoded with the 5 learned merges: low → [low,</w>] = 2;
    // lower → [low,e,r,</w>] = 4; newest → [n,e,w,est</w>] = 4;
    // widest → [w,i,d,est</w>] = 4
    val docs = Seq((1L, "low lower newest widest"),
      (2L, words.mkString(" "))).toDF("doc_id", "text")
    val got = text.Bpe.encode(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got(1L) == (4L, 14L), s"got ${got(1L)}")
    // encoding the training corpus reproduces training's final
    // symbol totals: 5·2 + 2·4 + 6·4 + 3·4 = 54
    assert(got(2L) == (16L, 54L), s"got ${got(2L)}")
  }

  test("bpe best-pair count is non-increasing and merges apply " +
      "non-overlapping left-to-right") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa aaaa aaaa banana banana cabana"),
      (2L, "aaaa banana cabana cabana")).toDF("doc_id", "text")
    val merges = text.Bpe.learnMerges(docs, "text", nMerges = 10)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.nonEmpty)
    // greedy argmax: a later merge can never beat an earlier one
    // (merging only removes or splits occurrences of existing pairs)
    assert(merges.sliding(2).forall {
      case Array(a, b) => b._4 <= a._4
      case _ => true
    }, merges.mkString(", "))
    // "aaaa" (4×a + eow): (a,a) counts 3 per word non-overlapping
    // would be wrong — left-to-right gives 2 merges in the first pass.
    // (a,a) count = 3 pairs per aaaa word × 4 words + banana/cabana 0
    val aa = merges.find(m => m._2 == "a" && m._3 == "a")
    assert(aa.isDefined && aa.get._4 == 12L, merges.mkString(", "))
  }

  test("langid picks the language whose stopwords dominate") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat in the house and the dog is that"),
      (2L, "el perro y la casa de que en un es"),
      (3L, "le chat est dans la maison et le chien de que"),
      (4L, "der hund und die katze in das haus ist zu ein"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.langId(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "fr", 4L -> "de"))
  }

  test("rolling fingerprint is order-sensitive, bow fingerprint is not") {
    import spark.implicits._
    import graft.dedup.Dedup
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"))
      .toDF("doc_id", "text")
    val roll = df.select(TextAnalysis.rollingFingerprint(col("text")))
      .collect().map(_.getLong(0))
    assert(roll(0) != roll(1))
    val bow = df.select(Dedup.bowFingerprint(col("text")))
      .collect().map(_.getString(0))
    assert(bow(0) == bow(1))
  }

  test("quality features are consistent") {
    val q = TextAnalysis.quality(Tables.documents(spark, sfDir), "doc_id", "text")
    assert(q.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1).count() == 0)
    assert(q.filter(col("n_tokens") <= 0).count() == 0)
  }

  test("pii redaction scrubs emails, phones and ips and counts them") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a.b+c@ex-ample.org or bob@x.io call 555-010-0042 now"),
      (2L, "host 10.0.0.1 and 192.168.255.3 no contact"),
      (3L, "dotted phone 555.010.0042 is a phone not an ip"),
      (4L, "plain text with nothing to hide"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3)), r.getString(4))).toMap
    assert(got(1L)._1 == ((2, 1, 0)))
    assert(got(1L)._2 == "mail <EMAIL> or <EMAIL> call <PHONE> now")
    assert(got(2L)._1 == ((0, 0, 2)))
    assert(got(2L)._2 == "host <IP> and <IP> no contact")
    // three dotted number groups are a phone; an IP needs four
    assert(got(3L)._1 == ((0, 1, 0)))
    assert(got(4L)._1 == ((0, 0, 0)) && got(4L)._2.contains("nothing"))
  }

  test("repetition stats count grams with multiplicity") {
    import spark.implicits._
    // "a b" appears 3×, "b a" 2×, "b c" 1× → 6 grams, 3 distinct
    val df = Seq((1L, "a b a b a b c"), (2L, "x y z")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(df, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(1L) == ((6L, 3L, 0.5, 0.5)))
    assert(got(2L) == ((2L, 2L, 0.0, 0.5)))
  }

  test("stratified sampling is deterministic, monotone in rate, and total at 1") {
    import spark.implicits._
    val ids = spark.range(2000).toDF("id")
    def kept(rate: Double) = ids
      .filter(TextAnalysis.sampleKeep(col("id"), lit(rate)))
      .collect().map(_.getLong(0)).toSet
    val k25 = kept(0.25); val k50 = kept(0.5); val k100 = kept(1.0)
    assert(k100.size == 2000)
    // a doc kept at a low rate stays kept at any higher rate — the
    // property that makes hash sampling stable across rate changes
    assert(k25.subsetOf(k50))
    assert(math.abs(k25.size / 2000.0 - 0.25) < 0.05)
    assert(math.abs(k50.size / 2000.0 - 0.5) < 0.05)
    assert(kept(0.25) == k25) // re-run identical
  }

  test("gopher rules: each rule trips on its own pathology") {
    import spark.implicits._
    val good = ("the a " + (0 until 58).map(i => f"tok$i%02d").mkString(" "))
    val docs = Seq(
      (1L, good),                                        // passes all
      (2L, "the a tiny document here"),                  // too short (mean len ok)
      (3L, "the a " + Seq.fill(58)("supercalifragilistic").mkString(" ")), // mean len
      (4L, "the a " + (0 until 58).map(_ => "####").mkString(" ")), // symbols+alpha
      (5L, (0 until 60).map(i => f"tok$i%02d").mkString(" ")) // no stopwords
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    def flags(i: Int) = (r(i).getAs[Boolean]("ok_len"),
      r(i).getAs[Boolean]("ok_mean_len"), r(i).getAs[Boolean]("ok_alpha"),
      r(i).getAs[Boolean]("ok_symbol"), r(i).getAs[Boolean]("ok_stop"),
      r(i).getAs[Boolean]("keep"))
    assert(flags(0) == (true, true, true, true, true, true))
    assert(flags(1) == (false, true, true, true, true, false))
    assert(flags(2) == (true, false, true, true, true, false))
    assert(flags(3)._4 == false) // symbol_frac = 58/60 > 0.1
    assert(flags(3)._3 == false) // #### has no alpha either
    assert(flags(4) == (true, true, true, true, false, false))
    // keep is exactly the conjunction on every row
    val all = TextAnalysis.gopherRules(
      Tables.documents(spark, sfDir), "doc_id", "text")
    assert(all.filter(col("keep") =!= (col("ok_len") && col("ok_mean_len") &&
      col("ok_alpha") && col("ok_symbol") && col("ok_stop"))).count() == 0)
  }

  test("winnow: shared w+k-1 token run shares a fingerprint; density ~2/(w+1)") {
    import spark.implicits._
    val k = 3; val w = 4
    // two documents sharing a 6-token run (= w+k-1): the winnowing
    // guarantee says at least one fingerprint must match
    val shared = "one two three four five six"
    val docs = Seq(
      (1L, "aa bb cc " + shared + " dd ee"),
      (2L, "xx yy " + shared + " zz"),
      (3L, "pp qq rr ss")) // 4 tokens: 2 grams < w → single partial window
      .toDF("doc_id", "text")
    val fps = TextAnalysis.winnow(docs, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val f1 = fps.filter(_._1 == 1L).map(_._3).toSet
    val f2 = fps.filter(_._1 == 2L).map(_._3).toSet
    assert((f1 & f2).nonEmpty, "shared run must yield a shared fingerprint")
    // short doc: at least one fingerprint from its partial window
    assert(fps.count(_._1 == 3L) >= 1)
    // every selected position is a valid gram position
    assert(fps.forall { case (_, pos, _) => pos >= 0 })
    // density on real data: expected ~2/(w+1) of grams selected;
    // allow a broad band (hash ties and boundary windows move it)
    val real = Tables.documents(spark, sfDir)
    val nGrams = real.select(
        greatest(size(split(col("text"), " ")) - (k - 1), lit(0)).as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    val nSel = TextAnalysis.winnow(real, "doc_id", "text", k, w).count()
    val density = nSel.toDouble / nGrams
    assert(density > 0.2 && density < 0.6,
      s"winnow density $density far from 2/(w+1)=0.4")
  }

  test("winnow tie-break is rightmost and selection is position-robust") {
    import spark.implicits._
    // identical windows: a doc of one repeated token — every gram
    // hash equal, so each window's min is its RIGHTMOST gram; with
    // w=4, selected positions advance one per window → all positions
    val rep = Seq((1L, Seq.fill(10)("same").mkString(" ")))
      .toDF("doc_id", "text")
    val sel = TextAnalysis.winnow(rep, "doc_id", "text", 3, 4)
      .collect().map(_.getLong(1)).sorted
    // grams 0..7; full windows end at 3..7, min picks window end
    assert(sel.toSeq == Seq(3L, 4L, 5L, 6L, 7L))
    // prefix insertion shifts positions but preserves fingerprints
    val a = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val b = Seq((1L, "pre1 pre2 alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val fa = TextAnalysis.winnow(a, "doc_id", "text", 3, 4)
      .collect().map(_.getLong(2)).toSet
    val fb = TextAnalysis.winnow(b, "doc_id", "text", 3, 4)
      .collect().map(_.getLong(2)).toSet
    assert((fa & fb).size >= (fa.size - 1),
      "fingerprints selected away from the edit must survive a prefix shift")
  }

  test("collocations: frozen pair tops PMI, minCount floors accidents") {
    import spark.implicits._
    // "ad hoc" always adjacent and rare: highest PMI; "the cat"
    // frequent but 'the' promiscuous: low PMI; single-shot pair
    // excluded by minCount
    val docs = (1 to 6).map(i =>
      (i.toLong, "the cat sat on the mat ad hoc " + s"only$i once$i")) ++
      Seq((7L, "the dog sat on the rug ad hoc unique pair"))
    val r = graft.text.Retrieval.collocations(
        docs.toDF("doc_id", "text"), "doc_id", "text", minCount = 5, k = 10)
      .collect()
    assert(r.nonEmpty)
    val top = (r(0).getString(0), r(0).getString(1))
    assert(top == ("ad", "hoc"), s"expected (ad,hoc) on top, got $top")
    val pairs = r.map(x => (x.getString(0), x.getString(1))).toSet
    assert(!pairs.contains(("unique", "pair")), "minCount must floor 1-shot pairs")
    // PMI of a pair with independent parts is near 0; of (ad, hoc):
    // p(xy)=p(x)=p(y) ⇒ pmi = ln(N_uni²/(N_bi·c)) > 0
    assert(r(0).getDouble(3) > 1.0)
  }

  test("count-min: never undercounts, exact when wide, collides when " +
      "narrow") {
    val docs = Tables.documents(spark, sfDir)
    val probes = Seq("the", "spark", "join", "merge", "batch")
    // forced-collision regime: width 4 << vocab — every estimate must
    // still dominate the true count (the one-sided CMS guarantee),
    // and with the corpus crammed into 4 buckets at least one probe
    // must actually overcount
    val narrow = graft.text.CountMin
      .estimate(docs, "text", probes, depth = 2, width = 4).collect()
    assert(narrow.forall(r => r.getLong(3) >= 0L), "est < true")
    assert(narrow.exists(r => r.getLong(3) > 0L), "no collision at w=4?")
    // wide regime: width far above vocab size — estimates exact
    val wide = graft.text.CountMin
      .estimate(docs, "text", probes, depth = 4, width = 65536).collect()
    assert(wide.forall(r => r.getLong(3) == 0L),
      s"collision at w=65536: ${wide.mkString(";")}")
  }

  test("inter-arrival gaps are exact and typed per ending event") {
    import java.sql.Timestamp
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5L, "a", 0.0),
      (2L, ts("2024-01-01 10:00:10"), 5L, "b", 0.0),  // gap 10s ends at b
      (3L, ts("2024-01-01 10:01:10"), 5L, "a", 0.0),  // gap 60s ends at a
      (4L, ts("2024-01-01 10:00:00"), 6L, "a", 0.0))  // other user: no gap
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = graft.streaming.EventStreams.interArrivalBatch(ev)
      .orderBy("event_type").collect()
    assert(r.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(r(0).getLong(1) == 1L && r(0).getLong(3) == 60000000L)
    assert(r(1).getLong(1) == 1L && r(1).getDouble(2) == 10.0)
  }
}

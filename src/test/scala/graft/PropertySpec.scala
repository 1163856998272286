package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.text.TextAnalysis

/** Property-based invariants for the map-side text operators —
  * randomized documents and window geometries catch boundary cases
  * example tests miss. */
class PropertySpec extends AnyFunSuite with SparkFixture {

  // raw ScalaCheck generators driven by fixed seeds (the
  // scalatest-scalacheck bridge is not on the offline classpath)
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n * 4).iterator
      .flatMap(i => g(Gen.Parameters.default,
        org.scalacheck.rng.Seed(i.toLong)))
      .take(n).toSeq

  private val tokenGen = Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(5))
  private val docGen = Gen.nonEmptyListOf(tokenGen).map(_.take(60))
  private val geomGen = for {
    size <- Gen.choose(1, 12)
    overlap <- Gen.choose(0, size - 1)
  } yield (size, overlap)

  test("chunking covers every token, in order, with exact overlap") {
    import spark.implicits._
    for ((tokens, (size, overlap)) <-
        samples(Gen.zip(docGen, geomGen), 25)) {
        val step = size - overlap
        val df = Seq((1L, tokens.mkString(" "))).toDF("doc_id", "text")
        val chunks = TextAnalysis.chunk(df, "doc_id", "text", size, overlap)
          .orderBy("chunk_id")
          .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
        // chunk i holds exactly tokens[i*step, i*step+size)
        chunks.foreach { case (i, text, n) =>
          val expect = tokens.slice(i * step, i * step + size)
          assert(text == expect.mkString(" "),
            s"chunk $i of ${tokens.length} toks size=$size overlap=$overlap")
          assert(n == expect.length)
        }
        // full coverage: the last chunk reaches the final token
        val (lastId, _, lastN) = chunks.last
        assert(lastId * step + lastN == tokens.length ||
          tokens.length <= size && chunks.length == 1)
        // chunk count matches the documented formula
        val expectChunks = math.max(1,
          math.ceil((tokens.length - overlap).toDouble / step).toInt)
        assert(chunks.length == expectChunks)
    }
  }

  test("split assignment is total, deterministic, and ~80/10/10") {
    import spark.implicits._
    val ids = (1L to 5000L).toDF("id")
    val counts = ids.select(TextAnalysis.assignSplit(col("id")).as("s"))
      .groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 5000L)
    assert(math.abs(counts("train") - 4000L) < 200, counts.toString)
    assert(math.abs(counts("val") - 500L) < 120, counts.toString)
    assert(math.abs(counts("test") - 500L) < 120, counts.toString)
    // deterministic across evaluations
    val again = ids.select(TextAnalysis.assignSplit(col("id")).as("s"))
      .groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == counts)
  }

  test("rolling fingerprint is order-sensitive where bow is not") {
    import spark.implicits._
    val rnd = new scala.util.Random(7) // seeded: identical run to run
    for (tokens <-
        samples(docGen.suchThat(_.distinct.length > 1), 10)) {
        val doc = tokens.mkString(" ")
        val perm = rnd.shuffle(tokens).mkString(" ")
        val df = Seq((doc, perm)).toDF("a", "b")
        val r = df.select(
          TextAnalysis.rollingFingerprint(col("a")).as("fa"),
          TextAnalysis.rollingFingerprint(col("b")).as("fb"),
          graft.dedup.Dedup.bowFingerprint(col("a")).as("ba"),
          graft.dedup.Dedup.bowFingerprint(col("b")).as("bb")).head()
        // bag-of-words collapses permutations; rolling hash keeps
        // them apart unless the permutation is identical
        assert(r.getString(2) == r.getString(3))
        if (doc != perm) assert(r.getLong(0) != r.getLong(1))
    }
  }

  test("greedy packing invariants hold for random docs and budgets") {
    import spark.implicits._
    val caseGen = for {
      nDocs <- Gen.choose(1, 40)
      lens <- Gen.listOfN(nDocs, Gen.choose(1, 30))
      budget <- Gen.choose(5L, 40L)
    } yield (lens, budget)
    for ((lens, budget) <- samples(caseGen, 12)) {
      val docs = lens.zipWithIndex.map { case (l, i) =>
        (i.toLong, s"g${i % 3}", Seq.fill(l)("t").mkString(" "))
      }.toDF("doc_id", "source", "text")
      val packed = graft.text.Packing
        .packGreedy(docs, "doc_id", "text", "source", budget)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      // every doc present exactly once
      assert(packed.length == lens.length)
      val byBin = packed.groupBy(p => (p._1, p._4))
      byBin.foreach { case ((g, bin), ds) =>
        // budget respected unless the bin is a single oversize doc
        assert(ds.map(_._3).sum <= budget || ds.length == 1,
          s"overfull shared bin $g/$bin: $ds")
        // bins hold doc-id-contiguous runs (greedy never reorders):
        // every doc between the bin's min and max id of that group
        // is in the same bin
        val ids = ds.map(_._2)
        val span = packed.filter(p => p._1 == g &&
          p._2 >= ids.min && p._2 <= ids.max)
        assert(span.forall(_._4 == bin))
      }
      // bin indices are 0-based and gapless per group
      packed.groupBy(_._1).foreach { case (_, ds) =>
        val bins = ds.map(_._4).distinct.sorted.toList
        assert(bins == (0L until bins.length).toList)
      }
    }
  }

  test("cdc cut pairs tile every doc for random token streams") {
    import spark.implicits._
    for (toksList <- samples(Gen.listOfN(10, docGen), 3)) {
      val docs = toksList.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val ch = graft.dedup.Dedup.cdcChunks(docs, "doc_id", "text")
        .collect()
        .map(r => (r.getLong(0), r.getAs[Number](1).longValue,
          r.getAs[Number](3).longValue))
      val nToks = toksList.map(_.length)
      // chunks tile: per-doc token counts sum to doc length, chunk
      // indices are 1..k
      ch.groupBy(_._1).foreach { case (id, rows) =>
        assert(rows.map(_._3).sum == nToks(id.toInt))
        assert(rows.map(_._2).sorted.toList ==
          (1L to rows.length).toList)
      }
      assert(ch.map(_._1).distinct.length == toksList.length)
    }
  }
}

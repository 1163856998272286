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
}

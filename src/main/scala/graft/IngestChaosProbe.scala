package graft

import org.apache.spark.sql.functions._

import graft.sources.{DocumentIngest, GraphStore, StreamingIngest}
import graft.sources.DocumentIngest.IndexSpec

/** Chaos probe for the streaming INGEST path (not part of the
  * library surface) — the [[graft.sources.StreamingIngest]] twin of
  * [[StreamChaosProbe]]: drives continuous upsert ingestion over a
  * real file source on a real multi-executor fabric while the
  * harness SIGKILLs an executor mid-batch, then verifies the
  * epoch-published (nodes, indexes) snapshot converges to the
  * latest-wins bulk answer anyway.
  *
  * The unit specs (StreamRestartSpec / ApiSpec) simulate the crash
  * points with stop/start cycles; this probe produces a real kill —
  * mid versioned-save, mid epoch flip, wherever it lands — and the
  * contract (previous epoch stays readable, batch replays and
  * converges) has to hold against actual partial writes.
  *
  * Phases (arg 1; arg 2 = base dir; corpus from SPARK_GRAFT_SF_DIR):
  *  - `feed1`: even-id docs as version 1 → drain.
  *  - `feed2`: odd-id docs as v1 PLUS every 4th even id as an
  *    UPDATED v2 (so the kill lands on a batch that both inserts and
  *    upserts) → drain; under graft.checkpoint.mode=local the batch
  *    is expected to die — the probe prints the failure.
  *  - `resume`: restart the same checkpoint, let the torn batch
  *    replay, then print snapshot-vs-oracle equality: the store's
  *    nodes and index rows against DocumentIngest over the
  *    deterministic latest-wins expectation.
  */
object IngestChaosProbe {
  def main(args: Array[String]): Unit = {
    val Array(phase, base) = args.take(2)
    val spark = SparkEnv.session()
    spark.sparkContext.setLogLevel("ERROR")
    val in = s"$base/in"; val root = s"$base/store"
    val ckpt = s"$base/ckpt"
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft64x")
    val specs = Seq(IndexSpec("cat", "text", Seq("cat")))

    // deterministic doc payloads: v is the version the key holds
    def payload(v: Int) = to_json(struct(
      concat(lit("c"), pmod(col("doc_id"), lit(7))).as("cat"),
      length(col("text")).as("len"), lit(v).as("v")))
    def corpus = spark.read.parquet(s"$dir/documents.parquet")
    def versioned(filterCol: org.apache.spark.sql.Column, v: Int) =
      corpus.filter(filterCol).select(
        concat(lit("d:"), col("doc_id")).as("key"),
        payload(v).as("doc"), lit(v.toLong).as("ts"))

    def stage(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val st = s"$base/stage-$tag"
      df.coalesce(4).write.mode("overwrite").parquet(st)
      new java.io.File(in).mkdirs()
      java.nio.file.Files.list(java.nio.file.Paths.get(st))
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .forEach { p =>
          java.nio.file.Files.move(p, java.nio.file.Paths.get(in,
            s"$tag-${p.getFileName.toString}"),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
    }

    def drain(): Option[String] = {
      val q = StreamingIngest.start(
        spark.readStream.schema("key STRING, doc STRING, ts BIGINT")
          .parquet(in),
        "key", "doc", "ts", specs, root, ckpt, availableNow = true)
      try { q.awaitTermination(); None }
      catch { case e: Throwable =>
        Some(s"${e.getClass.getSimpleName}: ${
          Option(e.getMessage).getOrElse("").take(300)}")
      }
    }

    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def jerr(err: Option[String]): String = err.map(jstr).getOrElse("null")
    def epochStr: String =
      GraphStore.currentEpoch(spark, root).toSeq.sorted
        .map { case (k, v) => s"$k=$v" }.mkString(",")

    phase match {
      case "feed1" =>
        stage(versioned(pmod(col("doc_id"), lit(2)) === 0, v = 1), "h0")
        val err = drain()
        println(s"""{"phase":"feed1","err":${jerr(err)},"nodes":${
          GraphStore.loadNodes(spark, root).count()},"epoch":${jstr(epochStr)}}""")
      case "feed2" =>
        stage(versioned(pmod(col("doc_id"), lit(2)) === 1, v = 1)
          .unionByName(versioned(pmod(col("doc_id"), lit(4)) === 0, v = 2)),
          "h1")
        val err = drain()
        println(s"""{"phase":"feed2","err":${jerr(err)},"epoch":${jstr(epochStr)}}""")
      case "resume" =>
        val err = drain()
        // latest-wins oracle over the full corpus: every 4th id is
        // v2, everything else v1 — exactly what the two feeds
        // delivered, whatever batching/kill happened in between
        val expectedDocs = versioned(pmod(col("doc_id"), lit(4)) === 0, 2)
          .unionByName(versioned(pmod(col("doc_id"), lit(4)) =!= 0, 1))
        val expNodes = DocumentIngest.nodes(expectedDocs, "key", "doc")
        val gotNodes = GraphStore.loadNodes(spark, root).drop("shard")
          .select("key_data", "details", "id")
        val expN = expNodes.select("key_data", "details", "id")
        val nodesMissing = expN.exceptAll(gotNodes).count()
        val nodesExtra = gotNodes.exceptAll(expN).count()
        val expIx = DocumentIngest.indexes(expNodes, specs)
        val gotIx = GraphStore.loadIndexes(spark, root)
          .select("index_name", "key_type", "key_str", "node_key")
        val ixMissing = expIx.exceptAll(gotIx).count()
        val ixExtra = gotIx.exceptAll(expIx).count()
        println(s"""{"phase":"resume","err":${jerr(err)},"docs":${corpus.count()},"nodes":${
          gotNodes.count()},"nodes_missing":$nodesMissing,"nodes_extra":$nodesExtra,"ix_missing":$ixMissing,"ix_extra":$ixExtra,"epoch":${jstr(epochStr)}}""")
      case other => sys.error(s"unknown phase: $other")
    }
    spark.stop()
  }
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic JSON-document ingestion — the batch form of the
  * reference's node-creation surface (`POST /detail` with
  * `key_data`, `details`, `indexes` + `lowercase_indexes`;
  * `models/egraph_detail_model.erl`, README "Adding Nodes").
  *
  * Documents arrive as rows with a unique key column and a JSON
  * details column; index specs name the JSON paths to index and
  * their types (`int | double | text | geo | date | datetime`),
  * with optional lowercase variants (`<name>_lc__` like the
  * reference). Output frames match graph.GraphBuilder /
  * index.TypedIndexes shapes, so everything downstream (probes,
  * traversal, search, store) composes.
  */
object DocumentIngest {

  /** One typed index over a JSON path, e.g.
    * IndexSpec("currency", "text", Seq("economy", "currency")). */
  final case class IndexSpec(name: String, keyType: String,
      jsonPath: Seq[String], lowercase: Boolean = false)

  /** Nodes frame: (key_data, id = xxhash64(key_data), details). */
  def nodes(docs: DataFrame, keyCol: String, detailsCol: String): DataFrame =
    docs.select(col(keyCol).cast("string").as("key_data"),
        col(detailsCol).cast("string").as("details"))
      .withColumn("id", xxhash64(col("key_data")))

  private def extract(details: Column, spec: IndexSpec): Column = {
    val raw = get_json_object(details, "$." + spec.jsonPath.mkString("."))
    if (spec.lowercase) lower(raw) else raw
  }

  /** Typed index rows (index_name, key_type, key_str, node_key),
    * one unioned branch per spec — written partitioned by
    * (index_name, key_type) the probes prune to one directory. */
  def indexes(nodes: DataFrame, specs: Seq[IndexSpec]): DataFrame = {
    require(specs.nonEmpty)
    specs.map { sp =>
      val name = if (sp.lowercase) sp.name + "_lc__" else sp.name
      nodes.select(
          lit(name).as("index_name"),
          lit(sp.keyType).as("key_type"),
          extract(col("details"), sp).as("key_str"),
          col("key_data").as("node_key"))
        .filter(col("key_str").isNotNull)
    }.reduce(_ unionByName _)
  }

  /** Latest-wins upsert — the batch form of the reference's node
    * update endpoint (`PUT /detail`): rows in `updates` replace
    * current rows with the same key, new keys append. One anti-join
    * shuffle; no window or global sort, so it scales by key
    * partitioning alone. */
  def upsertNodes(current: DataFrame, updates: DataFrame): DataFrame =
    current.join(updates.select("key_data"), Seq("key_data"), "left_anti")
      .unionByName(updates)

  /** Delete by key — the reference's `DELETE /detail`. */
  def deleteNodes(current: DataFrame, keys: DataFrame): DataFrame =
    current.join(keys.select("key_data"), Seq("key_data"), "left_anti")

  /** Incremental reindex after an upsert: drop index rows of the
    * touched keys, append freshly extracted rows — the reference's
    * per-node reindex, not a full rebuild. */
  def upsertIndexes(currentIx: DataFrame, updatedNodes: DataFrame,
      specs: Seq[IndexSpec]): DataFrame =
    currentIx.join(updatedNodes.select(col("key_data").as("node_key")),
        Seq("node_key"), "left_anti")
      .unionByName(indexes(updatedNodes, specs))

  /** Links frame from (source, destination, details) rows —
    * the `POST /link` surface (`models/egraph_link_model.erl`).
    * `bidirectional = true` stores both directions, the reference's
    * two-rows convention. */
  def links(rows: DataFrame, srcCol: String, dstCol: String,
      detailsCol: String, bidirectional: Boolean = false): DataFrame = {
    val fwd = rows.select(col(srcCol).cast("string").as("src_key"),
      col(dstCol).cast("string").as("dst_key"),
      col(detailsCol).cast("string").as("details"))
    if (!bidirectional) fwd
    else fwd.unionByName(fwd.select(col("dst_key").as("src_key"),
      col("src_key").as("dst_key"), col("details")))
  }
}

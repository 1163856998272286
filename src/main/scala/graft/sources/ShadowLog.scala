package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The `_sources`-shadowing segment-log protocol, in ONE place —
  * shared by [[DedupIndex]] (index segments, `_SUCCESS` markers) and
  * [[graft.streaming.StreamingDedup]] (verdict log, `_COMMITTED`
  * markers). The protocol:
  *
  *  - a directory is COMMITTED when `<dir>/<marker>` exists (the
  *    marker is written LAST, so a torn write is invisible);
  *  - a compaction target lists the directories it replaced in
  *    `<dir>/_sources`; the instant the target's marker lands those
  *    names are SHADOWED — excluded by readers even if a crashed
  *    cleanup left them on disk;
  *  - shadowing must be written as a CLOSURE: the target's
  *    `_sources` carries not just its direct sources but every name
  *    those sources already shadowed. Without the closure, a second
  *    compaction that deletes a first compaction target (whose own
  *    cleanup had crashed) deletes the only `_sources` naming the
  *    first's relics — resurrecting them and double-counting their
  *    content. [[sourcesClosure]] computes it from the listing.
  *
  * Mutations (compact, vacuum) assume the store's single-
  * maintenance-writer discipline — not concurrent with each other,
  * with a writer, or with an active streaming query, whose
  * in-flight marker-less directory is indistinguishable from a
  * crash orphan. */
object ShadowLog {

  /** (committed-and-unshadowed names, full shadowed set) under
    * `base`, names filtered by `accept`. One listing + one small
    * `_sources` read per committed compaction target. */
  def list(fs: FileSystem, base: Path, marker: String,
      accept: String => Boolean): (Seq[String], Set[String]) = {
    if (!fs.exists(base)) return (Nil, Set.empty)
    val committed = fs.listStatus(base).filter(_.isDirectory)
      .map(_.getPath.getName).filter(accept).sorted.toSeq
      .filter(d => fs.exists(new Path(base, s"$d/$marker")))
    val shadowed = committed.flatMap(d => readSources(fs, base, d)).toSet
    (committed.filterNot(shadowed), shadowed)
  }

  /** The `_sources` content a compaction of `srcs` must write: the
    * direct sources plus every already-shadowed name whose directory
    * is STILL ON DISK (a crash relic that must stay invisible).
    * Shadowed names whose dirs are confirmed gone are pruned — they
    * cannot resurrect, and without pruning the closure grows by the
    * full batch-name history at every compaction of a long-lived
    * stream. The one writer that could recreate a pruned name — a
    * streaming batch replay — is covered by the existing contract
    * that compaction never runs between a crash and its recovery;
    * pruning only widens that to "…nor between the crash and TWO
    * compaction+vacuum cycles", far outside any real checkpoint
    * lag.
    *
    * `retain` exempts names from the pruning: a log whose shadowed
    * names are load-bearing FACTS for another component must keep
    * them even after their dirs are gone. The pairs log retains a
    * streaming batch's name WHILE its index segment is visible —
    * `DedupIndex.compactSegments` classifies an index segment as
    * replay-pending precisely when its verdicts are NOT committed
    * under the pairs log, so pruning a still-live batch's name would
    * strand that segment as "replay-pending" forever (a liveness
    * leak, found in the r8 review); once the index segment is itself
    * compacted away the name is prunable (a late replay re-runs and
    * converges empty), which bounds the closure at O(live batch
    * segments) rather than the stream's full batch history. */
  def sourcesClosure(fs: FileSystem, base: Path, srcs: Seq[String],
      alreadyShadowed: Set[String],
      retain: String => Boolean = _ => false): Seq[String] =
    (srcs ++ alreadyShadowed.filter(d =>
      retain(d) || fs.exists(new Path(base, d))))
      .distinct.sorted

  def readSources(fs: FileSystem, base: Path, dir: String): Seq[String] = {
    val sp = new Path(base, s"$dir/_sources")
    if (!fs.exists(sp)) Nil
    else {
      val in = fs.open(sp)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      txt.split('\n').map(_.trim).filter(_.nonEmpty).toSeq
    }
  }

  def writeSources(fs: FileSystem, base: Path, dir: String,
      sources: Seq[String]): Unit = {
    val out = fs.create(new Path(base, s"$dir/_sources"), false)
    try out.write(sources.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Delete every accepted directory a reader cannot see — shadowed
    * relics of crashed cleanups and torn (marker-less) orphans.
    * Returns the deleted names. */
  def vacuum(fs: FileSystem, base: Path, marker: String,
      accept: String => Boolean): Seq[String] = {
    if (!fs.exists(base)) return Nil
    val live = list(fs, base, marker, accept)._1.toSet
    val dead = fs.listStatus(base).filter(_.isDirectory)
      .map(_.getPath.getName).filter(accept).filterNot(live).toSeq.sorted
    dead.foreach(d => fs.delete(new Path(base, d), true))
    dead
  }
}

package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Single-writer lease for the segment stores (r10 verdict item #5).
  *
  * Every mutation of a DedupIndex / EmbeddingDedupIndex store (update,
  * bulkLoad, compaction, reband, tombstone) assumes the store's
  * single-maintenance-writer discipline: ShadowLog commits, `_meta`,
  * `_layouts` and replayed-segment deletion all interleave silently if
  * two writers run at once — e.g. two streaming queries pointed at one
  * store root would collide on epoch-named segments and each could
  * "replay-delete" the other's commit. The lease converts that silent
  * corruption into a LOUD refusal at mutation entry.
  *
  * Protocol — `_lease` under the store root, ShadowLog conventions:
  *  - a mutation acquires the lease (atomic `rename` of an
  *    owner-stamped tmp file; rename-to-existing fails on HDFS and
  *    the local FS alike) and deletes it when done;
  *  - a LIVE foreign lease ⇒ `IllegalStateException` — the caller is
  *    racing another writer;
  *  - a STALE lease (older than `graft.lease.ttlMs`, default 15 min)
  *    is a crash orphan: the previous writer died between acquire and
  *    release. It is broken and taken over — age-based recovery, no
  *    operator intervention. Long mutations do NOT age out: the
  *    driver heartbeats the stamp every ttl/3 while the mutation
  *    runs (r11 ADVICE), so only a genuinely dead driver orphans a
  *    lease. If a host sleeps past the TTL with the heartbeat
  *    stalled and loses the lease anyway, the mutation FAILS loudly
  *    at its final ownership verify instead of reporting success.
  *
  * Scope and honesty: this is a loud-failure guard with the same
  * trust model as the rest of the store protocol, NOT a distributed
  * lock service — two writers racing the takeover of an *expired*
  * lease within one rename round-trip can both proceed (the window
  * is one FS rename; a correct deployment never runs two writers on
  * purpose). Readers never touch the lease. Cost: one read + one
  * rename + one delete per mutation — micro-batch compatible.
  */
object Lease {

  val FileName = "_lease"

  /** Crash-orphan age threshold. */
  def ttlMs(spark: SparkSession): Long =
    spark.conf.getOption("graft.lease.ttlMs")
      .flatMap(v => scala.util.Try(v.toLong).toOption)
      .getOrElse(15L * 60 * 1000)

  /** (owner, stampMillis) of the current lease file, if readable. */
  def read(fs: FileSystem, root: Path): Option[(String, Long)] = {
    val p = new Path(root, FileName)
    try {
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        txt.trim.split('\t') match {
          case Array(owner, ts) =>
            scala.util.Try(ts.toLong).toOption.map(owner -> _)
          case _ => None // torn write parses as absent, like _layouts
        }
      }
    } catch { case _: java.io.IOException => None }
  }

  // in-process holders, for an immediate (race-free) refusal when two
  // writers share one JVM — e.g. two streaming queries on one root
  private val held = scala.collection.concurrent.TrieMap.empty[String, String]

  // REENTRANT on the owning thread: composed mutations (retract =
  // pairs purge + tombstone) nest withWriter scopes; the inner scope
  // is a no-op instead of refusing its own outer scope. Cross-thread
  // nesting still refuses — only the acquiring thread re-enters.
  private val threadHeld = new ThreadLocal[scala.collection.mutable.Set[String]] {
    override def initialValue(): scala.collection.mutable.Set[String] =
      scala.collection.mutable.Set.empty
  }

  /** Run `body` holding the store's writer lease; release afterwards.
    * Refuses loudly if another live writer holds it; reentrant within
    * the acquiring thread. */
  def withWriter[T](spark: SparkSession, root: String)(body: => T): T = {
    val rootP = new Path(root)
    val key = rootP.toString
    if (threadHeld.get.contains(key)) body
    else {
      val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val owner = java.util.UUID.randomUUID().toString
      val ttl = ttlMs(spark)
      acquire(fs, rootP, owner, ttl)
      threadHeld.get += key
      // heartbeat (r11 ADVICE): a mutation legitimately running past
      // the TTL (a 100 TB-scale compaction/reband/bulkLoad) must not
      // look like a crash orphan to the next writer. The driver
      // re-stamps the lease every ttl/3, so the lease only ages out
      // when the driver is actually gone — not merely slow.
      val beat = heartbeat(fs, rootP, owner, ttl)
      var failed = true
      val out =
        try { val r = body; failed = false; r }
        finally {
          beat.interrupt(); threadHeld.get -= key
          if (failed) release(fs, rootP, owner)
        }
      // verify-then-release: if the lease was taken over anyway (the
      // host slept past the TTL with the heartbeat stalled), FAIL the
      // mutation loudly instead of reporting success over commits
      // that may have interleaved with the new writer's
      read(fs, rootP) match {
        case Some((who, _)) if who != owner =>
          held.remove(key, owner)
          throw new IllegalStateException(
            s"store $root: writer lease was taken over by $who during " +
              "this mutation (the host stalled past graft.lease.ttlMs); " +
              "this mutation's commits may interleave with the new " +
              "writer's — inspect the store before trusting either")
        case _ => release(fs, rootP, owner)
      }
      out
    }
  }

  /** Daemon thread re-stamping `_lease` every ttl/3 while a mutation
    * runs. The re-stamp is an in-place overwrite (not the acquire
    * rename): only this owner writes while it holds the lease, and a
    * reader that catches the torn microsecond parses it as absent —
    * the same window a crash orphan's takeover already carries. */
  private def heartbeat(fs: FileSystem, root: Path, owner: String,
      ttl: Long): Thread = {
    val t = new Thread(() => {
      try {
        while (!Thread.currentThread().isInterrupted) {
          Thread.sleep(math.max(1000L, ttl / 3))
          // re-stamp only while still ours — never clobber a taker
          if (read(fs, root).exists(_._1 == owner)) {
            val out = fs.create(new Path(root, FileName), true)
            try out.write(
              s"$owner\t${System.currentTimeMillis()}".getBytes("UTF-8"))
            finally out.close()
          }
        }
      } catch {
        case _: InterruptedException => ()
        case _: java.io.IOException => () // next beat retries; worst
        // case the lease ages out and the final verify fails loudly
      }
    }, s"graft-lease-heartbeat-${root.getName}")
    t.setDaemon(true)
    t.start()
    t
  }

  /** Take the lease for `owner` or throw. Package-visible for specs. */
  private[graft] def acquire(fs: FileSystem, root: Path, owner: String,
      ttl: Long): Unit = {
    val key = root.toString
    val now = System.currentTimeMillis()
    def refuse(who: String, age: Long): Nothing =
      throw new IllegalStateException(
        s"store $root is locked by writer $who (${age / 1000}s old, " +
          s"ttl ${ttl / 1000}s): a second concurrent writer would " +
          "interleave shadow commits — stop the other writer, or if it " +
          "crashed, wait out graft.lease.ttlMs (the lease is then " +
          "broken automatically)")
    // same-JVM fast path: no rename race, immediate refusal
    held.putIfAbsent(key, owner).foreach(w => refuse(w, 0))
    try {
      read(fs, root) match {
        case Some((who, ts)) if now - ts < ttl => refuse(who, now - ts)
        case Some(_) => // crash orphan: break it, then take over
          fs.delete(new Path(root, FileName), false)
          place(fs, root, owner, now, ttl)
        case None =>
          place(fs, root, owner, now, ttl)
      }
    } catch { case e: Throwable => held.remove(key, owner); throw e }
  }

  private def place(fs: FileSystem, root: Path, owner: String,
      now: Long, ttl: Long): Unit = {
    val tmp = new Path(root, s"$FileName.tmp-$owner")
    val out = fs.create(tmp, true)
    try out.write(s"$owner\t$now".getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, new Path(root, FileName))) {
      // lost the cross-process race to a concurrent acquirer
      fs.delete(tmp, false)
      val who = read(fs, root).map(_._1).getOrElse("unknown")
      throw new IllegalStateException(
        s"store $root: lost the lease race to writer $who")
    }
    // POSIX rename(2) silently REPLACES an existing destination (the
    // local FS maps Hadoop rename onto it), so a successful rename
    // does not prove we won — re-read and verify our owner id landed
    // (r11 ADVICE). On HDFS the rename itself already refused.
    read(fs, root) match {
      case Some((who, _)) if who == owner => ()
      case other =>
        throw new IllegalStateException(
          s"store $root: lost the lease race to writer " +
            s"${other.map(_._1).getOrElse("unknown")} (rename replaced)")
    }
  }

  private[graft] def release(fs: FileSystem, root: Path,
      owner: String): Unit = {
    try {
      // delete only our own lease: a stale-broken-and-reacquired file
      // belongs to the new writer
      if (read(fs, root).exists(_._1 == owner))
        fs.delete(new Path(root, FileName), false)
    } catch { case _: java.io.IOException => () }
    finally held.remove(root.toString, owner)
  }
}

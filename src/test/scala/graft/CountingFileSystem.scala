package graft

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, FSDataInputStream, Path, RawLocalFileSystem}

/** A local FileSystem under the `cfs:` scheme that counts metadata
  * calls — the test instrument behind the `_layouts` manifest's O(1)
  * claim (IndexLayout): locally the manifest is wall-clock-invisible
  * (listStatus on a warm local dir is ~free), so the claim that a
  * probe issues ONE manifest read instead of O(segments × tables)
  * directory walks — exactly the term that dominates on object
  * storage — needs a CALL-COUNT pin, not a timing. Register with
  * `conf.set("fs.cfs.impl", classOf[CountingFileSystem].getName)` and
  * address the store as `cfs:/abs/path`.
  */
class CountingFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "cfs"
  override def getUri: URI = URI.create("cfs:///")

  // RawLocalFileSystem's DeprecatedRawLocalFileStatus loads
  // permissions LAZILY via `new java.io.File(path.toUri)`, which
  // throws on any scheme but file: — materialize a plain FileStatus
  // up front so LocatedFileStatus wrapping (listLocatedStatus /
  // listFiles) never triggers it under the cfs scheme
  private def solid(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      org.apache.hadoop.fs.permission.FsPermission.getFileDefault,
      "", "", st.getPath)

  override def listStatus(p: Path): Array[FileStatus] = {
    CountingFileSystem.record("listStatus", p)
    super.listStatus(p).map(solid)
  }
  override def getFileStatus(p: Path): FileStatus = {
    CountingFileSystem.record("getFileStatus", p)
    solid(super.getFileStatus(p))
  }
  override def open(p: Path, bufferSize: Int): FSDataInputStream = {
    CountingFileSystem.record("open", p)
    super.open(p, bufferSize)
  }
}

object CountingFileSystem {
  private val calls =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]

  private[graft] def record(op: String, p: Path): Unit =
    calls.add(op -> p.toString)

  def reset(): Unit = calls.clear()

  /** Calls of `op` whose path satisfies `pred`. */
  def count(op: String, pred: String => Boolean): Int = {
    val it = calls.iterator()
    var n = 0
    while (it.hasNext) {
      val (o, p) = it.next()
      if (o == op && pred(p)) n += 1
    }
    n
  }
}

package graft.io

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Test-only filesystem (`cntfs:` scheme) that records every
  * `listStatus` target — the instrument behind ScanStatsSpec's
  * zero-listing assertion: a bytes-covered table's plan-time scan
  * sizing must be a pure manifest fold, with no per-generation-dir
  * namenode RPC (the 100× scale-up tax VERDICT r19 flagged).
  * Delegates everything to the local filesystem.
  *
  * Statuses are copied into plain [[FileStatus]]es with eager
  * permissions: RawLocalFileSystem's deprecated lazy permission
  * loader does `new java.io.File(status.getPath.toUri)`, which
  * rejects any scheme but `file:` — the copy keeps the cntfs paths
  * while never triggering that loader. */
class CountingFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "cntfs"
  override def getUri: java.net.URI = java.net.URI.create("cntfs:///")

  private def eager(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      if (st.isDirectory) FsPermission.getDirDefault
      else FsPermission.getFileDefault,
      System.getProperty("user.name"), System.getProperty("user.name"),
      st.getPath)

  override def listStatus(f: Path): Array[FileStatus] = {
    CountingFileSystem.listed.add(f.toUri.getPath)
    super.listStatus(f).map(eager)
  }

  override def getFileStatus(f: Path): FileStatus =
    eager(super.getFileStatus(f))
}

object CountingFileSystem {
  val listed = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** listStatus calls that targeted a generation data dir (the
    * expensive per-dir walk class; manifest-file listings on the
    * table dir itself are one call per table and excluded). */
  def dataDirListings: Seq[String] = {
    import scala.jdk.CollectionConverters._
    listed.asScala.toSeq.filter(_.contains("/data/"))
  }

  def reset(): Unit = listed.clear()
}

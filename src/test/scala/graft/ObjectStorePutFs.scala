package graft

import java.net.URI

import org.apache.hadoop.fs.{FSDataOutputStream, FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** An object-store-LIKE filesystem for the commit-coordinator tests: a
  * local filesystem under the `graftos` scheme whose create treats the
  * no-overwrite flag as meaningless — every create is a last-writer-wins
  * PUT, exactly the semantics S3-family stores give and exactly why the
  * versioned hub's scheme guard refuses them without a registered
  * coordinator. Mutual exclusion on this scheme can therefore ONLY come
  * from the CommitStore, never from the filesystem.
  */
class ObjectStorePutFs extends RawLocalFileSystem {
  override def getScheme: String = "graftos"
  override def getUri: URI = URI.create("graftos:///")

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    super.create(f, permission, true, bufferSize, replication, blockSize,
      progress)

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    super.create(f, true, bufferSize, replication, blockSize, progress)

  // RawLocal's lazy permission loader does `new File(path.toUri)`, which
  // only accepts the file: scheme — scrub statuses to eager plain ones
  // (object stores report synthetic permissions anyway)
  private def scrub(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication,
      s.getBlockSize, s.getModificationTime, s.getPath)

  override def getFileStatus(f: Path): FileStatus =
    scrub(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(scrub)
}

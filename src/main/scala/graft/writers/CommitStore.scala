package graft.writers

import org.apache.hadoop.fs.{FileSystem, Path}

/** The pluggable atomic-commit seam of the versioned hub — the LogStore
  * shape Delta Lake uses for object stores (Armbrust VLDB 2020 §3.2:
  * "mutual exclusion on log record creation", delegated to an external
  * coordinator where the store's own create is not atomic-exclusive).
  *
  * One operation matters: `putIfAbsent` — atomically claim a manifest path
  * and write its content, failing (false) iff another writer already
  * claimed it. The default implementation is the filesystem's own
  * create-exclusive (atomic on HDFS/local, refused LOUDLY on known
  * object-store schemes); registering a store for a scheme — e.g. a
  * DynamoDB/conditional-PUT coordinator for `s3a` — lifts that refusal,
  * because mutual exclusion no longer rests on the filesystem.
  */
trait CommitStore {

  /** Atomically create `path` with `content` iff absent. Returns false
    * when another writer already owns the path. On `true`, the content
    * must be durably visible to any subsequent reader of `path`.
    */
  def putIfAbsent(fs: FileSystem, path: Path, content: Array[Byte]): Boolean
}

object CommitStore {

  /** Default: `FileSystem.create(overwrite = false)` — POSIX O_EXCL /
    * HDFS create-exclusive. The scheme guard runs first: object stores
    * translate create to a last-writer-wins PUT and MUST NOT take this
    * path.
    */
  object CreateExclusive extends CommitStore {
    override def putIfAbsent(fs: FileSystem, path: Path,
        content: Array[Byte]): Boolean = {
      val out =
        try fs.create(path, /* overwrite = */ false)
        catch { case _: java.io.IOException => return false }
      try out.write(content) finally out.close()
      true
    }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, CommitStore]()

  /** Route every commit on `scheme` (lowercase, e.g. "s3a") through
    * `store`. Returns the previously registered store, if any.
    */
  def register(scheme: String, store: CommitStore): Option[CommitStore] =
    Option(registry.put(scheme.toLowerCase(java.util.Locale.ROOT), store))

  def unregister(scheme: String): Unit =
    registry.remove(scheme.toLowerCase(java.util.Locale.ROOT))

  private[writers] def registered(scheme: String): Option[CommitStore] =
    Option(registry.get(scheme.toLowerCase(java.util.Locale.ROOT)))

  /** True when commits on this scheme have an explicit coordinator — the
    * scheme guard then stands down (the coordinator owns atomicity).
    */
  private[graft] def hasStoreFor(scheme: String): Boolean =
    registry.containsKey(scheme.toLowerCase(java.util.Locale.ROOT))

  private[writers] def forScheme(scheme: String): CommitStore =
    registered(scheme).getOrElse(CreateExclusive)
}

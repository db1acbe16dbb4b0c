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
  * create-exclusive (atomic on HDFS; an atomic hard-link claim on the
  * local scheme, whose Hadoop create-exclusive is only check-then-act;
  * refused LOUDLY on known object-store schemes); registering a store
  * for a scheme — e.g. a
  * DynamoDB/conditional-PUT coordinator for `s3a` — lifts that refusal,
  * because mutual exclusion no longer rests on the filesystem.
  */
trait CommitStore {

  /** Atomically create `path` with `content` iff absent. Returns false
    * when another writer already owns the path. On `true`, the content
    * must be durably visible to any subsequent reader of `path`.
    */
  def putIfAbsent(fs: FileSystem, path: Path, content: Array[Byte]): Boolean

  /** Release any coordination state held for `path` — called by the hub's
    * vacuum for every manifest version it drops, so the coordinator's log
    * retains exactly the manifest retention (Delta's DynamoDB-entry-TTL ≥
    * deleted-file-retention discipline). Sweeping only vacuum-dropped
    * versions keeps crash recovery intact for every live version; a
    * zombie writer older than the vacuum horizon is out of contract
    * either way. Default: nothing held.
    */
  def releaseClaim(fs: FileSystem, path: Path): Unit = { val _ = (fs, path) }
}

object CommitStore {

  /** Default: `FileSystem.create(overwrite = false)` — POSIX O_EXCL /
    * HDFS create-exclusive. The scheme guard runs first: object stores
    * translate create to a last-writer-wins PUT and MUST NOT take this
    * path.
    */
  object CreateExclusive extends CommitStore {
    override def putIfAbsent(fs: FileSystem, path: Path,
        content: Array[Byte]): Boolean =
      if (fs.getScheme == "file") putIfAbsentLocal(path, content)
      else {
        val out =
          try fs.create(path, /* overwrite = */ false)
          catch { case _: java.io.IOException => return false }
        try out.write(content) finally out.close()
        true
      }

    /** Hadoop's RawLocalFileSystem.create(overwrite = false) is
      * check-then-act, NOT O_EXCL: two racers can both pass the exists()
      * probe, both "win" the same version number, and their interleaved
      * data/.crc writes can leave the manifest permanently unreadable —
      * a silent lost update. On the local scheme, claim via an atomic
      * hard link of the FULLY-WRITTEN content instead: exactly one racer
      * links the name, and the manifest appears atomically with its
      * content (no claim-to-content torn window at all, and no .crc
      * sibling to tear — ChecksumFileSystem reads checksum-less files
      * fine).
      */
    private def putIfAbsentLocal(path: Path, content: Array[Byte]): Boolean = {
      val f = new java.io.File(path.toUri.getPath)
      Option(f.getParentFile).foreach(_.mkdirs())
      val tmp = new java.io.File(f.getParentFile,
        s".${f.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      try {
        java.nio.file.Files.write(tmp.toPath, content)
        try { java.nio.file.Files.createLink(f.toPath, tmp.toPath); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } finally tmp.delete()
    }
  }

  /** A REAL conditional-write coordinator in the external-claim-log
    * shape (Delta's S3 + DynamoDB LogStore lineage, Armbrust VLDB 2020
    * §3.2): mutual exclusion lives in a CLAIM LOG on a filesystem whose
    * record creation is atomic (local disk via the hard-link claim —
    * the same primitive [[CreateExclusive]] uses), while the manifest
    * content lands on the DESTINATION store with plain overwrite
    * semantics — all an object store guarantees. Claiming and writing
    * are write-ahead ordered:
    *
    *   1. the claim record carrying the FULL manifest content is
    *      written to a temp file and fsync'd;
    *   2. the record is hard-linked to its claim name — the atomic
    *      commit point; exactly one racer wins;
    *   3. the winner copies the content to the destination path
    *      (overwrite PUT).
    *
    * A writer that dies between 2 and 3 left a durable claim with the
    * full content, so any later `putIfAbsent` on the same path FINISHES
    * the dead winner's destination write before reporting the conflict
    * (the "recover incomplete entries" step). Recovery rewrites the
    * same bytes, so a recovery racing the original winner is benign.
    *
    * `claimDir` is the coordinator's log root — one file per claimed
    * manifest, named by the md5 of the absolute destination URI. On a
    * real deployment this directory sits on the coordination tier
    * (NFS/HDFS/a lock service volume); the destination scheme needs no
    * atomicity at all.
    */
  final class ClaimLogCommitStore(claimDir: java.io.File) extends CommitStore {
    require(claimDir.isDirectory || claimDir.mkdirs(),
      s"cannot create claim log at $claimDir")

    /** Claim keys hash the CANONICAL destination URI — `fs.makeQualified`
      * (absolute path, default scheme/authority filled in) + URI dot-segment
      * normalization + lowercased scheme and host — so two writers
      * addressing one destination through differently-spelled but
      * equivalent Paths ("file:/x", "file:///x", "FILE://host/a/../a/x")
      * take the SAME claim instead of both "winning".
      */
    private def md5Key(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString

    private def recordFor(fs: FileSystem, path: Path): java.io.File = {
      val u = fs.makeQualified(path).toUri.normalize()
      def lc(s: String): String = s.toLowerCase(java.util.Locale.ROOT)
      val canonical = new java.net.URI(
        Option(u.getScheme).map(lc).orNull,
        Option(u.getAuthority).map(lc).orNull,
        u.getPath, null, null).toString
      new java.io.File(claimDir, s"claim-${md5Key(canonical)}")
    }

    /** CLAIM-KEY FORMAT CHANGE (upgrade boundary): builds before the
      * canonicalization keyed claims by the RAW `path.toString`. A claim
      * log written by such a build must stay visible, or a dead winner's
      * pre-upgrade claim is never recovered and a post-upgrade writer can
      * re-claim (double-win) the same version. [[putIfAbsent]] therefore
      * PROBES this legacy key whenever the canonical record is absent;
      * new claims are only ever written under the canonical key, so the
      * legacy path is read-mostly and dies out with vacuum
      * ([[releaseClaim]] sweeps both keys). Out of contract: OLD-build
      * writers still running concurrently with new ones (a rolling
      * upgrade must drain old writers first) — the probe closes the
      * visibility gap, not a live old-vs-new race.
      */
    private def legacyRecordFor(path: Path): java.io.File =
      new java.io.File(claimDir, s"claim-${md5Key(path.toString)}")

    private def writeDestination(fs: FileSystem, path: Path,
        content: Array[Byte]): Unit = {
      // overwrite PUT via unique temp + rename: concurrent recovery and
      // winner write the same bytes, and the rename keeps readers from
      // ever seeing a half-written manifest
      val tmp = new Path(path.getParent,
        s".${path.getName}.${java.util.UUID.randomUUID().toString.take(8)}.inprogress")
      val out = fs.create(tmp, /* overwrite = */ true)
      try { out.write(content); out.hflush() } finally out.close()
      if (!fs.rename(tmp, path)) {
        // a racer landed first (rename-no-overwrite semantics): same
        // bytes by construction — drop the temp and accept theirs
        fs.delete(tmp, false)
        require(fs.exists(path),
          s"claim-log destination write lost both ways: $path")
      }
    }

    /** Retention: drop the claim record for a vacuumed manifest. The
      * record exists to (a) exclude racers on a LIVE version and (b) let
      * recovery finish a dead winner's write; a version the vacuum dropped
      * needs neither, and keeping its record would grow the claim log by
      * one full manifest copy per commit forever.
      */
    override def releaseClaim(fs: FileSystem, path: Path): Unit = {
      val _ = recordFor(fs, path).delete()
      val _2 = legacyRecordFor(path).delete()
    }

    override def putIfAbsent(fs: FileSystem, path: Path,
        content: Array[Byte]): Boolean = {
      val rec = recordFor(fs, path)
      // upgrade-boundary probe: a pre-canonicalization build's claim on
      // this destination lives under the raw-path key — honor it (and
      // finish its dead winner's write) instead of double-winning
      val legacy = legacyRecordFor(path)
      if (!rec.exists() && legacy.exists()) {
        if (!fs.exists(path))
          writeDestination(fs, path,
            java.nio.file.Files.readAllBytes(legacy.toPath))
        return false
      }
      val tmp = new java.io.File(claimDir,
        s".${rec.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      val claimed =
        try {
          val ch = java.nio.channels.FileChannel.open(tmp.toPath,
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
          try { ch.write(java.nio.ByteBuffer.wrap(content)); ch.force(true) }
          finally ch.close()
          try { java.nio.file.Files.createLink(rec.toPath, tmp.toPath); true }
          catch { case _: java.nio.file.FileAlreadyExistsException => false }
        } finally tmp.delete()
      if (claimed) { writeDestination(fs, path, content); true }
      else {
        // finish a dead winner's write before reporting the conflict
        if (!fs.exists(path))
          writeDestination(fs, path,
            java.nio.file.Files.readAllBytes(rec.toPath))
        false
      }
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

package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** ATOMIC all-or-nothing exclusive install of a commit record — the one
  * primitive [[TimeTravel]]'s optimistic concurrency stands on, with the
  * stronger contract commit records need: a record becomes VISIBLE only
  * with its full content, and installing over an existing record throws
  * `FileAlreadyExistsException` (the conflict signal the commit loop
  * rebases on). This is exactly Delta's LogStore contract
  * (`io.delta.storage.LogStore.write(..., overwrite=false)`) scaled to
  * essentials; it exists as a trait so storage without a usable built-in
  * (plain S3 has no atomic create-if-absent — Delta runs an external
  * commit coordinator there) plugs in through [[LogStore.register]]
  * instead of being a documented dead end.
  *
  * Why not a plain exclusive create: the record would appear in the
  * namespace at open time with its bytes landing later (a guaranteed
  * window on HDFS until close), and a conflict-losing writer immediately
  * reads the winner's record to decide whether it may rebase — an
  * empty/partial read shows no touched dirs and no txn marker, so it
  * would wrongly rebase past a conflicting rewrite (lost update) or
  * re-land a same-stream batch (double delivery). Plain readers
  * resolving a mid-write tip version hit the same torn-record window.
  * So every implementation lands the bytes in a TEMP file first and
  * installs atomically; temp names (`.<name>.<token>.tmp`) never parse
  * as log entries, and [[TimeTravel.vacuum]] age-sweeps crash residue. */
trait LogStore {

  /** Install `bytes` at `target` atomically and exclusively: after this
    * returns, a reader opening `target` sees the full content; if
    * `target` already exists, throw
    * `java.nio.file.FileAlreadyExistsException` and leave it untouched.
    * Implementations must not leak their temp file on any path. */
  def installExclusive(fs: FileSystem, target: Path,
      bytes: Array[Byte]): Unit
}

object LogStore {

  /** `file:` paths hard-LINK the temp into place: `Files.createLink` is
    * kernel-atomic and fails if the target exists — the Delta LogStore
    * pattern for local filesystems. */
  object LocalLink extends LogStore {
    override def installExclusive(fs: FileSystem, target: Path,
        bytes: Array[Byte]): Unit = {
      val t = java.nio.file.Paths.get(fs.makeQualified(target).toUri)
      java.nio.file.Files.createDirectories(t.getParent)
      val tmp = t.resolveSibling(
        s".${t.getFileName}.${TimeTravel.newToken()}.tmp")
      // write AND link inside the finally's scope: a failed write (disk
      // full) or a lost link race must not leak the temp — vacuum sweeps
      // aged residue, but the happy/conflict paths clean up themselves
      try {
        java.nio.file.Files.write(tmp, bytes)
        java.nio.file.Files.createLink(t, tmp)
      } finally java.nio.file.Files.deleteIfExists(tmp)
    }
  }

  /** HDFS-like filesystems RENAME: atomic in the namespace, refuses an
    * existing destination (rename-fails-if-exists). */
  object AtomicRename extends LogStore {
    override def installExclusive(fs: FileSystem, target: Path,
        bytes: Array[Byte]): Unit = {
      val tmp = new Path(target.getParent,
        s".${target.getName}.${TimeTravel.newToken()}.tmp")
      // the finally-delete is a no-op after a successful rename (the
      // temp no longer exists) and reclaims it on every failure path
      try {
        val out = fs.create(tmp, true)
        try out.write(bytes) finally out.close()
        val renamed =
          try fs.rename(tmp, target)
          catch { case e: java.io.IOException =>
            if (fs.exists(target)) throw new java.nio.file
              .FileAlreadyExistsException(target.toString)
            else throw e
          }
        // rename returning false is only a lost commit race when the
        // target actually exists; otherwise it is a filesystem failure
        // and reporting it as a conflict would send the commit loop
        // into a rebase against a phantom winner
        if (!renamed) {
          if (fs.exists(target)) throw new java.nio.file
            .FileAlreadyExistsException(target.toString)
          else throw new java.io.IOException(
            s"rename($tmp -> $target) returned false but the target " +
              "does not exist: filesystem failed to install the record")
        }
      } finally fs.delete(tmp, false)
    }
  }

  private val byScheme =
    scala.collection.concurrent.TrieMap[String, LogStore](
      "file" -> LocalLink)

  /** Schemes whose `rename` is known to be copy+delete with NO atomic
    * fail-if-exists (plain object stores): defaulting them to
    * [[AtomicRename]] would let two racing writers both "win" a commit,
    * the second silently overwriting the first's record — the exact
    * lost update this abstraction exists to prevent. They REFUSE until
    * a real coordinator is registered. (Azure's abfs/wasb rename IS
    * atomic in the namespace and stays on the rename default, matching
    * Delta's store assignments.) */
  private val renameUnsafe = Set("s3", "s3a", "s3n", "gs", "oss", "cos")

  /** Plug a store in for a filesystem scheme — e.g. an external
    * log-commit coordinator for `s3a`, where neither hard links nor
    * rename-fails-if-exists exist. Registration is process-wide, like
    * Delta's `spark.delta.logStore.<scheme>.impl`. */
  def register(scheme: String, store: LogStore): Unit =
    byScheme.put(scheme, store)

  /** The store for a scheme: local link for `file`, any registered
    * override, atomic rename otherwise (correct on HDFS-semantics
    * filesystems). Known rename-unsafe object-store schemes fail LOUDLY
    * instead of falling through to a store that would lose commits. */
  def forScheme(scheme: String): LogStore =
    byScheme.getOrElse(scheme,
      if (renameUnsafe(scheme))
        throw new IllegalStateException(
          s"scheme '$scheme' has no atomic rename-fails-if-exists: " +
            "commits through the rename store could silently overwrite " +
            s"each other — LogStore.register(\"$scheme\", ...) an " +
            "external log-commit coordinator first")
      else AtomicRename)
}

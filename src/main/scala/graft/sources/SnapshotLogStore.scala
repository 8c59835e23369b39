package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE atomic primitive the snapshot commit protocol needs: create a
  * manifest file exclusively (fail if it already exists). Everything else
  * in the format — data-file writes, manifest content, retries — is
  * coordination-free; this call is where exactly one writer wins a
  * version number.
  *
  * Store matrix (why this is a trait and not an `if`):
  *  - local filesystems: Hadoop's `RawLocalFileSystem.create(overwrite =
  *    false)` is CHECK-THEN-ACT (exists? then create) — two racing
  *    writers can both "win" and one silently clobbers the other: a lost
  *    commit. [[LocalExclusiveLogStore]] goes through java.nio
  *    `CREATE_NEW` (O_CREAT|O_EXCL — a single atomic syscall).
  *  - HDFS (and stores with server-side atomic create):
  *    [[HadoopAtomicLogStore]] — `fs.create(p, overwrite = false)` is
  *    atomic at the NameNode.
  *  - object stores (S3-family): plain PUT is last-writer-wins — neither
  *    of the above is safe. The contract maps to the store's
  *    conditional-write primitive (`If-None-Match: *` on S3,
  *    `ifGenerationMatch=0` on GCS, `If-None-Match` on ABFS).
  *    [[ConditionalPutLogStore]] pins that contract in-process (an
  *    atomic check-and-create under a JVM-wide lock) so the commit
  *    protocol's store-dependence is testable without a cloud
  *    dependency; a production S3 implementation replaces the lock with
  *    the conditional PUT header and nothing above this trait changes.
  *
  * Failure signaling: existence races MUST surface as
  * `FileAlreadyExistsException` (java.nio or Hadoop flavor) or an
  * IOException with the target already present — the committers treat
  * exactly those as "lost the race, retry on the new tip" and rethrow
  * everything else (a permission error or full disk is not a collision).
  */
trait SnapshotLogStore {
  /** Atomically create `path` containing `body` iff it does not exist.
    *
    * Torn-write contract: once the CREATE has succeeded, a failure of the
    * body write/close (disk full, I/O fault) MUST remove the partial
    * file before rethrowing. The committers classify "IOException with
    * the manifest present" as a lost race — a torn manifest left behind
    * by OUR OWN failed write would be classified as a collision, become
    * the tip, and poison every subsequent read/commit while masking the
    * real cause. Delete-on-failure keeps the invariant: a manifest that
    * exists was either fully published or is a racing writer's. */
  def writeExclusive(fs: FileSystem, path: Path, body: Array[Byte]): Unit
}

/** java.nio `CREATE_NEW` — the atomic exclusive create for file:// roots
  * (Hadoop's local `create(overwrite=false)` is check-then-act). */
object LocalExclusiveLogStore extends SnapshotLogStore {
  override def writeExclusive(fs: FileSystem, path: Path, body: Array[Byte]): Unit = {
    val local = java.nio.file.Paths.get(path.toUri.getPath)
    val out = java.nio.file.Files.newOutputStream(local,
      java.nio.file.StandardOpenOption.CREATE_NEW,
      java.nio.file.StandardOpenOption.WRITE)
    // create succeeded: from here a write/close failure must not leave a
    // torn file that the committers would misread as a rival's manifest
    try { out.write(body); out.close() }
    catch {
      case e: Throwable =>
        try out.close() catch { case _: Throwable => () }
        try java.nio.file.Files.deleteIfExists(local) catch { case _: Throwable => () }
        throw e
    }
  }
}

/** `fs.create(p, overwrite = false)` — atomic on HDFS (server-side at the
  * NameNode) and any FileSystem with the same create contract. */
object HadoopAtomicLogStore extends SnapshotLogStore {
  override def writeExclusive(fs: FileSystem, path: Path, body: Array[Byte]): Unit = {
    val out = fs.create(path, /* overwrite = */ false)
    try { out.write(body); out.close() }
    catch {
      case e: Throwable =>
        try out.close() catch { case _: Throwable => () }
        try fs.delete(path, false) catch { case _: Throwable => () }
        throw e
    }
  }
}

/** The object-store shape: an atomic compare-and-create — "PUT iff the
  * key does not exist". In-process the check-and-create pair runs under
  * one JVM-wide lock, which is exactly the guarantee a conditional PUT
  * (`If-None-Match: *`) gives across processes; a real S3/GCS/ABFS
  * implementation swaps the lock for the header and keeps the contract.
  * Exists-check + write both go through the Hadoop FileSystem, so this
  * works against any scheme in tests. */
object ConditionalPutLogStore extends SnapshotLogStore {
  private val lock = new Object
  override def writeExclusive(fs: FileSystem, path: Path, body: Array[Byte]): Unit =
    lock.synchronized {
      if (fs.exists(path))
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(path.toString)
      val out = fs.create(path, /* overwrite = */ true) // existence already settled under the lock
      try { out.write(body); out.close() }
      catch {
        case e: Throwable =>
          try out.close() catch { case _: Throwable => () }
          try fs.delete(path, false) catch { case _: Throwable => () }
          throw e
      }
    }
}

/** DELIBERATELY UNSAFE: the check-then-act create every naive
  * object-store integration starts with (HEAD then PUT — last writer
  * wins). Exists so the multi-writer stress spec can DEMONSTRATE the
  * lost-commit anomaly this store family causes and prove
  * [[ConditionalPutLogStore]] closes it; never the default for any
  * scheme. `betweenCheckAndWrite` runs in the check-to-write window so a
  * spec can hold both racers past the check deterministically (a
  * barrier) instead of hoping a sleep lines the schedules up. */
class NonAtomicLogStore(betweenCheckAndWrite: () => Unit = () => ())
    extends SnapshotLogStore {
  override def writeExclusive(fs: FileSystem, path: Path, body: Array[Byte]): Unit = {
    if (fs.exists(path))
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(path.toString)
    betweenCheckAndWrite()
    val out = fs.create(path, /* overwrite = */ true) // the unsafe part: blind PUT
    try out.write(body) finally out.close()
  }
}

object SnapshotLogStore {
  /** Default store for a root: nio exclusive-create on local schemes,
    * Hadoop atomic create elsewhere (HDFS-class semantics). Object-store
    * schemes would map to their conditional-PUT implementation here. */
  def forFileSystem(fs: FileSystem): SnapshotLogStore = fs match {
    case _: org.apache.hadoop.fs.RawLocalFileSystem |
         _: org.apache.hadoop.fs.LocalFileSystem => LocalExclusiveLogStore
    case _ => HadoopAtomicLogStore
  }
}

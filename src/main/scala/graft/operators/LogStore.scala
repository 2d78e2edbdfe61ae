package graft.operators

import java.io.IOException
import java.nio.file.{FileAlreadyExistsException, Files, NoSuchFileException, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/**
 * The snapshot table format's METADATA-IO fabric — every manifest
 * read, atomic manifest publish, lock claim, ref update, listing and
 * cleanup in [[Snapshot]] goes through this trait (the Delta-Lake
 * `LogStore` pattern), so the commit protocol is a property of the
 * STORE, not of `java.nio.file`. Data files were always
 * storage-agnostic (they ride Spark's Hadoop-FS readers/writers);
 * this closes the gap for the commit log itself: without it the
 * format — however good its plans — could only ever run on a POSIX
 * mount, which at a literal 100 TB is not where tables live.
 *
 * Contract points the protocol depends on:
 *
 *  - [[putIfAbsent]] is the COMMIT PRIMITIVE: publish `bytes` at
 *    `path` all-or-nothing, failing with
 *    [[java.nio.file.FileAlreadyExistsException]] if `path` already
 *    exists. Readers never observe a torn manifest.
 *  - [[createNew]] is the LOCK PRIMITIVE: atomically create-an-empty
 *    file, `false` if it already exists.
 *  - [[rename]] moves a staged directory under `files/` to its commit
 *    name in O(1) without copying data (same-store rename).
 *
 * Implementations:
 *  - [[LocalLogStore]] — `java.nio.file`: `ATOMIC_MOVE` publish,
 *    `createFile` lock (today's exact semantics, the default for
 *    scheme-less paths).
 *  - [[HadoopLogStore]] — `org.apache.hadoop.fs.FileSystem` for any
 *    scheme-qualified URI (`hdfs://…`, `file:///…`, `s3a://…`). On
 *    HDFS, `rename` refuses an existing destination and
 *    `createNewFile` is atomic, so the protocol holds as-is. On the
 *    `file:` FS the same calls map to POSIX rename/create. On S3(-like)
 *    object stores rename is copy+delete and create-new is not
 *    conditional, so SINGLE-WRITER deployments are safe out of the box
 *    but multi-writer mutual exclusion needs the store's conditional
 *    write (S3 `If-None-Match` PUT) or an external lock (the DynamoDB
 *    coordination Delta documents) wired into [[putIfAbsent]]/
 *    [[createNew]] — the two methods are the documented extension
 *    points, and everything else composes unchanged.
 *
 * Resolution: [[LogStore.forPath]] — a scheme-qualified path gets the
 * Hadoop store (configured from the active Spark session's Hadoop
 * conf), anything else the local store. Stateless; resolving is
 * per-call cheap (Hadoop caches `FileSystem` instances internally).
 */
trait LogStore {
  def exists(path: String): Boolean
  def isDirectory(path: String): Boolean
  def read(path: String): Array[Byte]
  /** Atomic publish: `path` appears with the full `bytes` or not at
    * all; throws [[FileAlreadyExistsException]] if `path` exists. */
  def putIfAbsent(path: String, bytes: Array[Byte]): Unit
  /** Atomic replace (last-writer-wins refs, written under the commit
    * lock): `path` ends up holding exactly `bytes`. */
  def putReplace(path: String, bytes: Array[Byte]): Unit
  /** Immediate children as (name, isDirectory); Nil for a missing or
    * non-directory path. */
  def list(path: String): Seq[(String, Boolean)]
  def mkdirs(path: String): Unit
  /** Atomic create-empty-file; false if it already exists. */
  def createNew(path: String): Boolean
  /** Delete a file (or empty directory); false if absent. */
  def delete(path: String): Boolean
  def deleteTree(path: String): Unit
  /** Same-store rename; throws if the destination exists. */
  def rename(src: String, dst: String): Unit
  def modifiedTime(path: String): Long
  def size(path: String): Long

  /** Regular files under `dir`, recursively, as `dir`-relative
    * paths — the listing primitive vacuum/fsck sweep with. Composed
    * from [[list]], so every store gets it for free. */
  final def walkFiles(dir: String): Seq[String] = {
    def go(d: String, prefix: String): Seq[String] =
      list(d).flatMap {
        case (name, true) => go(s"$d/$name", s"$prefix$name/")
        case (name, false) => Seq(s"$prefix$name")
      }
    go(dir, "")
  }

  /** Total bytes of a file, or of every regular file under a
    * directory; 0 for a missing path. */
  final def sizeTree(path: String): Long =
    if (!exists(path)) 0L
    else if (isDirectory(path)) walkFiles(path).map(f => size(s"$path/$f")).sum
    else size(path)
}

object LogStore {
  // "hdfs://…", "s3a://…", "file:///…" — anything scheme-qualified
  // rides Hadoop; bare paths keep today's java.nio semantics. Schemes
  // must be >= 2 chars: a single letter before ':/' is a Windows
  // drive path (C:/data/t), not a URI scheme — routing it to Hadoop
  // would be a silent misroute (every real FS scheme is >= 2 chars).
  private val schemed = "^([A-Za-z][A-Za-z0-9+.-]+):/.*".r

  // custom-store instances by class name (stores must be stateless —
  // both built-ins are objects; a custom one is constructed once)
  private val custom =
    new java.util.concurrent.ConcurrentHashMap[String, LogStore]()

  /** The store for a table path. Scheme-qualified URIs ride
    * [[HadoopLogStore]] unless the session registers a CUSTOM store
    * for that scheme — `spark.graft.logstore.<scheme> = <class>` (a
    * zero-arg-constructible [[LogStore]]) — the plug point for object
    * stores whose atomicity needs native conditional writes (an S3
    * `If-None-Match` putIfAbsent, a DynamoDB-coordinated createNew)
    * rather than the Hadoop FS translation. Bare paths keep
    * [[LocalLogStore]]'s java.nio semantics. */
  def forPath(path: String): LogStore = path match {
    case schemed(scheme) =>
      org.apache.spark.sql.SparkSession.getActiveSession
        .flatMap(_.conf.getOption(s"spark.graft.logstore.$scheme"))
        .map(cls => custom.computeIfAbsent(cls, c =>
          Class.forName(c).getDeclaredConstructor().newInstance()
            .asInstanceOf[LogStore]))
        .getOrElse(HadoopLogStore)
    case _ => LocalLogStore
  }
}

/** `java.nio.file` implementation — rename/create atomics on a POSIX
  * mount, byte-for-byte the pre-abstraction behavior. */
object LocalLogStore extends LogStore {
  private def p(s: String): Path = Paths.get(s)

  override def exists(path: String): Boolean = Files.exists(p(path))
  override def isDirectory(path: String): Boolean = Files.isDirectory(p(path))
  override def read(path: String): Array[Byte] = Files.readAllBytes(p(path))

  /** Genuinely conditional publish: `createLink(dst, tmp)` fails
    * ATOMICALLY on an existing destination (POSIX link(2) semantics),
    * so even a true race — two writers past any exists() pre-check,
    * possible after a stale-lock double-steal — has exactly one
    * winner; rename(2) would silently replace. Filesystems without
    * hard links fall back to exists-check + ATOMIC_MOVE, which keeps
    * a narrow TOCTOU window under that same double-steal race (the
    * documented caveat the link path exists to remove). */
  override def putIfAbsent(path: String, bytes: Array[Byte]): Unit = {
    val dst = p(path)
    val tmp = dst.resolveSibling(
      "_tmp-" + java.util.UUID.randomUUID().toString.take(8) +
        "-" + dst.getFileName)
    Files.write(tmp, bytes)
    if (Files.exists(dst)) {
      Files.deleteIfExists(tmp)
      throw new FileAlreadyExistsException(path)
    }
    try {
      Files.createLink(dst, tmp)
      Files.deleteIfExists(tmp)
    } catch {
      case _: FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new FileAlreadyExistsException(path)
      case _: UnsupportedOperationException =>
        Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
    }
  }

  override def putReplace(path: String, bytes: Array[Byte]): Unit = {
    val dst = p(path)
    val tmp = dst.resolveSibling(
      "_tmp-" + java.util.UUID.randomUUID().toString.take(8) +
        "-" + dst.getFileName)
    Files.write(tmp, bytes)
    Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  override def list(path: String): Seq[(String, Boolean)] = {
    if (!Files.isDirectory(p(path))) return Nil
    val ls = Files.list(p(path))
    try ls.iterator().asScala
      .map(c => (c.getFileName.toString, Files.isDirectory(c))).toSeq
    finally ls.close()
  }

  override def mkdirs(path: String): Unit = Files.createDirectories(p(path))

  override def createNew(path: String): Boolean =
    try { Files.createFile(p(path)); true }
    catch { case _: FileAlreadyExistsException => false }

  override def delete(path: String): Boolean = Files.deleteIfExists(p(path))

  override def deleteTree(path: String): Unit = {
    if (!Files.exists(p(path))) return
    val walk = Files.walk(p(path))
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  override def rename(src: String, dst: String): Unit = {
    if (Files.exists(p(dst))) throw new FileAlreadyExistsException(dst)
    Files.move(p(src), p(dst)) // atomic: same filesystem
  }

  override def modifiedTime(path: String): Long =
    try Files.getLastModifiedTime(p(path)).toMillis
    catch { case _: NoSuchFileException => throw new NoSuchFileException(path) }

  override def size(path: String): Long = Files.size(p(path))
}

/** `org.apache.hadoop.fs.FileSystem` implementation for any
  * scheme-qualified URI. The Hadoop conf comes from the active Spark
  * session (so `fs.*` settings — endpoints, credentials — apply); a
  * bare `Configuration` is the headless fallback. See the trait docs
  * for the per-fabric atomicity ledger (HDFS full, file: POSIX,
  * S3-like needs conditional-write wiring). */
object HadoopLogStore extends LogStore {
  import org.apache.hadoop.fs.{FileSystem, UnsupportedFileSystemException, Path => HPath}

  private def conf: org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  private def fsOf(path: String): (FileSystem, HPath) = {
    val hp = new HPath(path)
    val fs = hp.getFileSystem(conf) match {
      // the checksummed local FS writes .crc sidecars that do NOT
      // move with a FileContext (raw) rename — a putReplace'd file
      // would fail its next checksummed read. Raw is also what
      // FileContext resolves for file:, so every primitive sees one
      // consistent filesystem; checksums buy nothing on a local
      // mount the commit protocol fsyncs through anyway.
      case l: org.apache.hadoop.fs.LocalFileSystem => l.getRawFileSystem
      case other => other
    }
    (fs, hp)
  }

  override def exists(path: String): Boolean = {
    val (fs, hp) = fsOf(path); fs.exists(hp)
  }

  override def isDirectory(path: String): Boolean = {
    val (fs, hp) = fsOf(path)
    try fs.getFileStatus(hp).isDirectory
    catch { case _: java.io.FileNotFoundException => false }
  }

  override def read(path: String): Array[Byte] = {
    val (fs, hp) = fsOf(path)
    val in = fs.open(hp)
    try in.readAllBytes() finally in.close()
  }

  /** The java.nio path when `fs` is the (raw) local filesystem —
    * file:// URIs get [[LocalLogStore]]'s POSIX atomics for the two
    * operations where the Hadoop API's local translation is weaker
    * than the kernel's: conditional publish (link(2) vs
    * check-then-create) and reader-atomic replace (rename(2) vs the
    * AbstractFileSystem default of delete-then-rename, which only
    * HDFS overrides atomically). */
  private def localPath(fs: FileSystem, hp: HPath): Option[String] =
    fs match {
      case _: org.apache.hadoop.fs.RawLocalFileSystem =>
        Some(hp.toUri.getPath)
      case _ => None
    }

  private def writeTmp(fs: FileSystem, dst: HPath,
                       bytes: Array[Byte]): HPath = {
    val tmp = new HPath(dst.getParent,
      "_tmp-" + java.util.UUID.randomUUID().toString.take(8) +
        "-" + dst.getName)
    val out = fs.create(tmp, false)
    try out.write(bytes) finally out.close()
    tmp
  }

  override def putIfAbsent(path: String, bytes: Array[Byte]): Unit = {
    val (fs, dst) = fsOf(path)
    localPath(fs, dst) match {
      case Some(lp) => LocalLogStore.putIfAbsent(lp, bytes) // link(2) conditional
      case None =>
        // pre-check + no-overwrite rename: exact on HDFS (rename refuses
        // an existing destination); on stores whose rename overwrites,
        // the pre-check still catches every non-racing double publish —
        // multi-writer S3 wires a conditional PUT here instead
        if (fs.exists(dst)) throw new FileAlreadyExistsException(path)
        val tmp = writeTmp(fs, dst, bytes)
        if (!fs.rename(tmp, dst)) {
          fs.delete(tmp, false)
          throw new FileAlreadyExistsException(path)
        }
    }
  }

  /** Reader-atomic replace: an unlocked concurrent reader (`tags()`
    * is lock-free by design) sees the old bytes or the new, never a
    * missing path. `file:` URIs take [[LocalLogStore]]'s
    * ATOMIC_MOVE+REPLACE_EXISTING (Hadoop's OWN local overwrite-rename
    * is the AbstractFileSystem default delete-then-rename — a real
    * missing window, measured); HDFS takes
    * `FileContext.rename(Rename.OVERWRITE)`, which DFS implements as
    * one atomic namespace operation. Stores supporting neither fall
    * back to delete-then-rename, whose transient missing-dst window
    * the read side's bounded retry covers. */
  override def putReplace(path: String, bytes: Array[Byte]): Unit = {
    val (fs, dst) = fsOf(path)
    localPath(fs, dst) match {
      case Some(lp) => LocalLogStore.putReplace(lp, bytes)
      case None =>
        val tmp = writeTmp(fs, dst, bytes)
        try {
          val fc = org.apache.hadoop.fs.FileContext.getFileContext(
            dst.toUri, conf)
          fc.rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        } catch {
          case _: UnsupportedOperationException
             | _: UnsupportedFileSystemException =>
            if (fs.exists(dst)) fs.delete(dst, false)
            if (!fs.rename(tmp, dst))
              throw new IOException(s"putReplace: rename to $path failed")
        }
    }
  }

  override def list(path: String): Seq[(String, Boolean)] = {
    val (fs, hp) = fsOf(path)
    try fs.listStatus(hp).toSeq.map(s => (s.getPath.getName, s.isDirectory))
    catch { case _: java.io.FileNotFoundException => Nil }
  }

  override def mkdirs(path: String): Unit = {
    val (fs, hp) = fsOf(path); fs.mkdirs(hp); ()
  }

  /** Only an already-exists outcome means "lock held" — any other
    * IOException (permissions, connectivity) must PROPAGATE, not
    * silently read as contention. `file:` URIs take [[LocalLogStore]]'s
    * `Files.createFile` (O_EXCL-atomic): Hadoop's `createNewFile` on
    * the raw local FS is exists-then-create — a TOCTOU that could
    * admit two lock holders, the same hole the putIfAbsent/putReplace
    * shunts close. */
  override def createNew(path: String): Boolean = {
    val (fs, hp) = fsOf(path)
    localPath(fs, hp) match {
      case Some(lp) => LocalLogStore.createNew(lp)
      case None =>
        try fs.createNewFile(hp)
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: FileAlreadyExistsException => false
        }
    }
  }

  override def delete(path: String): Boolean = {
    val (fs, hp) = fsOf(path); fs.delete(hp, false)
  }

  override def deleteTree(path: String): Unit = {
    val (fs, hp) = fsOf(path)
    if (fs.exists(hp)) { fs.delete(hp, true); () }
  }

  override def rename(src: String, dst: String): Unit = {
    val (fs, s) = fsOf(src)
    val d = new HPath(dst)
    if (fs.exists(d)) throw new FileAlreadyExistsException(dst)
    if (!fs.rename(s, d))
      throw new IOException(s"rename $src -> $dst failed")
  }

  override def modifiedTime(path: String): Long = {
    val (fs, hp) = fsOf(path)
    try fs.getFileStatus(hp).getModificationTime
    catch { case _: java.io.FileNotFoundException =>
      throw new NoSuchFileException(path) }
  }

  override def size(path: String): Long = {
    val (fs, hp) = fsOf(path); fs.getFileStatus(hp).getLen
  }
}

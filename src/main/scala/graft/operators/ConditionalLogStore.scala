package graft.operators

import java.nio.file.FileAlreadyExistsException

/**
 * REFERENCE CONDITIONAL-WRITE STORE — the executable form of the
 * multi-writer object-store contract [[LogStore]]'s docs describe:
 * on S3-like stores a filesystem rename is copy+delete and
 * create-new is not conditional, so the two primitives the commit
 * protocol's mutual exclusion rests on — [[putIfAbsent]] (manifest
 * publish) and [[createNew]] (lock claim) — must be arbitrated by a
 * write the STORE makes conditional: an S3 `If-None-Match: *` PUT,
 * or an external coordination table (the DynamoDB pattern Delta's
 * `S3DynamoDBLogStore` documents).
 *
 * This class IS that wiring, with one substitution: the conditional
 * primitive is a shared in-JVM atomic map (`ConcurrentHashMap
 * .putIfAbsent` — one winner under any race, by the JMM) instead of
 * a network call, and the byte storage delegates to
 * [[HadoopLogStore]] so Spark's data-file IO works unchanged. To run
 * against real S3, replace the two `claims` operations with the
 * store's conditional PUT (or a DynamoDB `attribute_not_exists`
 * put-item) and keep EVERYTHING else verbatim — the class is the
 * template, and the optimistic-concurrency spec suite that drives it
 * (two racing stagers, one winner, loser rebases —
 * ConditionalStoreSpec) is the conformance test a real binding
 * should pass.
 *
 * Register per scheme: `spark.graft.logstore.s3a =
 * graft.operators.ConditionalWriteLogStore` — every table under that
 * scheme then claims its locks and publishes its manifests through
 * the conditional path.
 *
 * Claim lifecycle: a successful [[putIfAbsent]]/[[createNew]]
 * records the path; [[delete]]/[[deleteTree]] release (the lock
 * release and vacuum paths); [[rename]] carries claims across the
 * move. A path already present on the underlying store but absent
 * from the map (pre-registration history) still refuses through the
 * delegate's own check — the map arbitrates RACES, the store stays
 * the source of truth for existence.
 */
class ConditionalWriteLogStore extends LogStore {
  import ConditionalWriteLogStore.claims

  private def delegate: LogStore = HadoopLogStore

  override def putIfAbsent(path: String, bytes: Array[Byte]): Unit = {
    // the conditional write: on S3 this is `PUT If-None-Match: *`
    if (claims.putIfAbsent(path, java.lang.Boolean.TRUE) != null)
      throw new FileAlreadyExistsException(path)
    try delegate.putIfAbsent(path, bytes)
    catch { case e: Throwable => claims.remove(path); throw e }
  }

  override def createNew(path: String): Boolean =
    if (claims.putIfAbsent(path, java.lang.Boolean.TRUE) != null) false
    else {
      val ok = delegate.createNew(path)
      if (!ok) claims.remove(path) // pre-registration file on disk
      ok
    }

  override def delete(path: String): Boolean = {
    claims.remove(path)
    delegate.delete(path)
  }

  override def deleteTree(path: String): Unit = {
    val prefix = path.stripSuffix("/") + "/"
    claims.keySet.removeIf(k => k == path || k.startsWith(prefix))
    delegate.deleteTree(path)
  }

  // SINGLE-OWNER assumption (VERDICT r13): the claims-map walk below
  // is not atomic against a concurrent claim — safe here because
  // renames only ever move STAGED paths their renamer exclusively
  // owns (commitStaged under the lock); a real S3 binding renaming
  // shared paths would need a conditional copy+delete instead.
  override def rename(src: String, dst: String): Unit = {
    delegate.rename(src, dst)
    val prefix = src.stripSuffix("/") + "/"
    claims.keySet.forEach { k =>
      if (k == src || k.startsWith(prefix)) {
        claims.remove(k)
        claims.put(dst + k.stripPrefix(src.stripSuffix("/")), java.lang.Boolean.TRUE)
      }
    }
  }

  override def exists(path: String): Boolean = delegate.exists(path)
  override def isDirectory(path: String): Boolean = delegate.isDirectory(path)
  override def read(path: String): Array[Byte] = delegate.read(path)
  override def putReplace(path: String, bytes: Array[Byte]): Unit =
    delegate.putReplace(path, bytes) // refs rewrite under the lock
  override def list(path: String): Seq[(String, Boolean)] = delegate.list(path)
  override def mkdirs(path: String): Unit = delegate.mkdirs(path)
  override def modifiedTime(path: String): Long = delegate.modifiedTime(path)
  override def size(path: String): Long = delegate.size(path)
}

object ConditionalWriteLogStore {
  /** The coordination service stand-in: one JVM-wide claim per path.
    * Swap for S3 `If-None-Match` / DynamoDB conditional put-item in a
    * real binding. */
  private[graft] val claims =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
}

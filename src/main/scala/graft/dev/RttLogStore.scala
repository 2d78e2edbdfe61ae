package graft.dev

import graft.operators.{LocalLogStore, LogStore}

/**
 * A SIMULATED-RTT [[LogStore]] for benchmarks: every metadata call
 * sleeps `graft.dev.rttMs` milliseconds (default 2) before delegating
 * to [[LocalLogStore]] on the scheme-stripped path — a local-disk
 * stand-in for an object store where each metadata operation is a
 * network round trip. Registered per the custom-store plug point:
 *
 * {{{
 *   spark.conf.set("spark.graft.logstore.file", "graft.dev.RttLogStore")
 *   // table paths "file:/tmp/…": metadata pays the RTT, while the
 *   // DATA files ride Spark's native file:// Hadoop FS at disk speed
 * }}}
 *
 * The `file:` scheme is the deliberate choice: the commit log's IO
 * routes here, but `df.write.parquet("file:/…")` keeps working
 * unchanged — exactly the asymmetry of a real object-store deployment
 * (data-plane bandwidth fine, metadata-plane latency dominant), which
 * is what the ConcurrencyBench rebase-depth axis needs to expose.
 * O(calls) combinators (walkFiles/sizeTree) accumulate delays
 * naturally, so a sweep that fans out pays fan-out × RTT like life.
 */
class RttLogStore extends LogStore {
  private def rttMs: Long =
    sys.props.get("graft.dev.rttMs").map(_.toLong).getOrElse(2L)

  private def strip(p: String): String = {
    val noScheme = p.stripPrefix("file:")
    // "file:///x" and "file:/x" both mean "/x"
    if (noScheme.startsWith("//")) noScheme.dropWhile(_ == '/').prepended('/')
    else noScheme
  }
  private def d[A](body: => A): A = {
    val ms = rttMs
    if (ms > 0) Thread.sleep(ms)
    body
  }

  override def exists(path: String): Boolean = d(LocalLogStore.exists(strip(path)))
  override def isDirectory(path: String): Boolean =
    d(LocalLogStore.isDirectory(strip(path)))
  override def read(path: String): Array[Byte] = d(LocalLogStore.read(strip(path)))
  override def putIfAbsent(path: String, bytes: Array[Byte]): Unit =
    d(LocalLogStore.putIfAbsent(strip(path), bytes))
  override def putReplace(path: String, bytes: Array[Byte]): Unit =
    d(LocalLogStore.putReplace(strip(path), bytes))
  override def list(path: String): Seq[(String, Boolean)] =
    d(LocalLogStore.list(strip(path)))
  override def mkdirs(path: String): Unit = d(LocalLogStore.mkdirs(strip(path)))
  override def createNew(path: String): Boolean =
    d(LocalLogStore.createNew(strip(path)))
  override def delete(path: String): Boolean = d(LocalLogStore.delete(strip(path)))
  override def deleteTree(path: String): Unit =
    d(LocalLogStore.deleteTree(strip(path)))
  override def rename(src: String, dst: String): Unit =
    d(LocalLogStore.rename(strip(src), strip(dst)))
  override def modifiedTime(path: String): Long =
    d(LocalLogStore.modifiedTime(strip(path)))
  override def size(path: String): Long = d(LocalLogStore.size(strip(path)))
}

package graft

/** Fingerprint-keyed build-once/probe-many cache for stored indexes
  * (the deployment shape every `*_indexed` query row grades: train /
  * build once per ingested dataset, probe per query).
  *
  * Two guarantees, shared by every stored index in the repo:
  *
  *  - STALENESS: the cache path is keyed by an md5 over (layout
  *    version, source-file name/size/mtime), so neither regenerated
  *    source data nor a constants/format change can ever serve an
  *    index built under the old world (the r7 testdata regeneration
  *    made the first failure mode concrete; r8 ADVICE named the
  *    second).
  *  - ATOMIC PUBLISH: the build lands in a private temp dir renamed
  *    into the fingerprinted location, with the `_built` marker
  *    written INSIDE the dir before the rename — a crashed or
  *    concurrent build can never leave a half-written index that a
  *    racing session reads.
  *
  * At 100 TB the same discipline applies with the tmp dir swapped
  * for a warehouse path and the rename for the object store's
  * atomic-commit primitive. */
object IndexCache {

  /** Cache location for an index over `files` under `dir`, keyed by
    * `layout` (a version string naming every constant the on-disk
    * format depends on) and the files' name/size/mtime. */
  def path(prefix: String, dir: String, files: Seq[String],
      layout: String): String = {
    val sig = layout + "||" + files.map { n =>
      val f = new java.io.File(dir, n)
      val fs: Array[java.io.File] =
        if (f.isDirectory) f.listFiles().sortBy(_.getName) else Array(f)
      fs.map(x => s"${x.getName}:${x.length}:${x.lastModified}")
        .mkString("|")
    }.mkString("||")
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"${System.getProperty("java.io.tmpdir")}/${prefix}_" +
      s"${new java.io.File(dir).getName}_$h"
  }

  /** Per-path JVM monitors: the rename handles cross-PROCESS races
    * (distinct pids → distinct tmp dirs), but two THREADS of one JVM
    * — the concurrent-submission pattern the bench measures — share
    * a pid and would build into the same tmp tree; they serialize
    * here instead (r9 review item). The thread id in the tmp suffix
    * is defense in depth. */
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Ensure `out` holds a fully-built index: absent → run `build`
    * against a temp dir and publish it by atomic rename. Returns
    * `out`. A lost rename race is benign — the winner's index is
    * byte-equivalent (same fingerprint), so the loser deletes its
    * build and serves the winner's. */
  def ensure(out: String)(build: String => Unit): String = {
    val lock = jvmLocks.computeIfAbsent(out, _ => new Object)
    lock.synchronized {
      val marker = new java.io.File(out, "_built")
      if (!marker.exists()) {
        val tmp = new java.io.File(out + ".build." +
          java.lang.ProcessHandle.current().pid() + "." +
          Thread.currentThread().getId())
        build(tmp.getPath)
        new java.io.File(tmp, "_built").createNewFile()
        if (!tmp.renameTo(new java.io.File(out))) {
          if (!marker.exists())
            throw new IllegalStateException(s"index publish failed: $out")
          rm(tmp)
        }
      }
    }
    out
  }

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete()
    ()
  }
}

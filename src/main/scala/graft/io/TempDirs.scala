package graft.io

/** Scratch directories with JVM-exit cleanup.
  *
  * Several surfaces stage real data in temp dirs — the q46 lifecycle's
  * JSON landing + warehouse, the bench warmup's sink probe, the
  * session warehouse for index-split catalog tables. Bare
  * `createTempDirectory` leaks a full data copy per invocation (the
  * bench alone runs q46 twice per round); registering a recursive
  * delete at exit bounds the footprint to the live JVM. Hook count is
  * bounded by invocations per process (a handful), not data volume.
  */
object TempDirs {

  /** Create a temp directory that is deleted recursively at JVM exit. */
  def scratch(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(p.toFile)))
    p.toString
  }

  /** Recursive delete, now: the in-session reclamation twin of the
    * exit hook (q46's warehouse generation GC uses it to keep only the
    * live + previous generation on disk). */
  def deleteRecursively(p: java.nio.file.Path): Unit = delete(p.toFile)

  private def delete(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(delete))
    f.delete()
    ()
  }
}

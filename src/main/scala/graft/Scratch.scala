package graft

/** Session-lifetime scratch directories for writer-shaped queries
  * (q43/q43b/q141 seed + persist + merge cycles): every invocation
  * needs a fresh directory — parallel Bench reps must not collide —
  * but leaving them behind accretes disk on a shared box across the
  * standing sf0.01 + sf0.1 sweeps and multi-rep bench runs (review
  * finding r16). A JVM shutdown hook deletes everything this process
  * created; queries are long finished by then. */
object Scratch {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    var p = created.poll()
    while (p != null) {
      try deleteRecursively(p.toFile) catch { case _: Exception => }
      p = created.poll()
    }
  }, "graft-scratch-cleanup"))

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(); ()
  }

  /** a fresh temp directory, deleted at JVM exit. */
  def dir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }
}

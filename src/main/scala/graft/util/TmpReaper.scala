package graft.util

/** JVM-exit reaper for /tmp artifacts the engine creates (bucketed
  * edge tables, per-JVM catalog warehouses): long-lived hosts running
  * many bench/verify JVMs must not accumulate unbounded /tmp usage
  * (r13 ADVICE / verdict task 7 — generalized from the edge tables to
  * every engine-owned temp dir). Registration is idempotent; deletion
  * is best-effort and never throws.
  */
object TmpReaper {
  private val dirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.io.File]()
  @volatile private var hooked = false
  private val lock = new Object

  def track(path: String): Unit = {
    dirs.add(new java.io.File(path))
    if (!hooked) lock.synchronized {
      if (!hooked) {
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          dirs.forEach { dir =>
            def rm(f: java.io.File): Unit = {
              if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
              f.delete(): Unit
            }
            try rm(dir) catch { case _: Throwable => () }
          }
        }, "graft-tmp-reaper"))
        hooked = true
      }
    }
  }
}

package graft

/** Absolute scratch root for the sink round-trip queries (q09c, q66,
  * q91, q94, q95, q96*, q79e).
  *
  * These queries write a fixed per-query directory and overwrite it on
  * re-invocation (Bench runs each query twice per round), so the path must
  * be stable within a process but must NOT depend on the working
  * directory: the earlier CWD-relative `target/...` form silently
  * scattered sink output wherever the harness happened to be launched
  * from. The JVM temp root is absolute, writable everywhere the tests
  * run, and per-machine — a cluster deployment would point this at a
  * job-scoped distributed-store prefix instead (one line, here).
  */
object Scratch {
  def dir(name: String): String = {
    val root = System.getProperty("java.io.tmpdir", "/tmp")
    s"$root/graft-scratch/$name"
  }
}

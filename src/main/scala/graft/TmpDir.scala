package graft

import org.apache.spark.sql.DataFrame

/** Scratch-directory lifecycle for queries that must materialize an
  * intermediate layout (roundtrips, bucketing, compaction, file-drop
  * ingest). The bench harness replays every query 4x at two scales in
  * one JVM — unregistered UUID-named dirs grow /tmp without bound, so
  * every scratch dir is registered for deletion on JVM exit, and the
  * hot call sites additionally release eagerly once the (small) final
  * aggregate is checkpointed off the files.
  */
object TmpDir {
  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val hookInstalled = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Allocate a unique scratch path under java.io.tmpdir, registered for
    * recursive deletion at JVM shutdown.
    */
  def scratch(prefix: String): String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_${prefix}_${java.util.UUID.randomUUID().toString.take(8)}"
    registered.add(p)
    if (hookInstalled.compareAndSet(false, true)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        var d = registered.poll()
        while (d != null) { delete(d); d = registered.poll() }
      }, "graft-tmpdir-cleanup"))
    }
    p
  }

  /** Recursively delete a path (best-effort; missing is fine). */
  def delete(path: String): Unit = {
    val root = new java.io.File(path)
    def rec(f: java.io.File): Unit = {
      val children = f.listFiles()
      if (children != null) children.foreach(rec)
      f.delete(): Unit
    }
    if (root.exists()) rec(root)
  }

  /** Sever `df`'s dependency on the scratch files (eager localCheckpoint —
    * only call on SMALL final aggregates) and delete the dir immediately,
    * instead of waiting for JVM exit.
    */
  def releasing(df: DataFrame, path: String): DataFrame = {
    val pinned = df.localCheckpoint(eager = true)
    delete(path)
    pinned
  }
}

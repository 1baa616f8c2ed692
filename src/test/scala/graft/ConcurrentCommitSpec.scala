package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CommitLog

/** Linearizability properties of the H21 optimistic-concurrency
  * commit protocol under a REAL race: N writers on N threads, each
  * retry-looping an append of its own file from whatever stale tip it
  * reads. No outcome ordering is assumed — only the invariants the
  * protocol owes its users:
  *   - versions are contiguous 0..N (no gaps, no duplicates: the
  *     atomic claim admits exactly one writer per slot);
  *   - no lost update: the tip carries EVERY writer's file;
  *   - monotone growth: each version's file list is a superset of its
  *     predecessor's (appends never drop files while rebasing);
  *   - a reader at any moment parses only complete commits (the
  *     hard-link publish is all-or-nothing — checked by a concurrent
  *     reader thread that polls the log during the storm).
  */
class ConcurrentCommitSpec extends AnyFunSuite {

  private def freshTable(): String = {
    val p = java.nio.file.Files.createTempDirectory("graft_ccommit").toString
    require(CommitLog.tryCommit(p, CommitLog.Commit(0L, 0L, Seq("base"), Seq.empty)))
    p
  }

  test("8 racing appenders: contiguous versions, no lost update, monotone") {
    val table = freshTable()
    val n = 8
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val conflicts = new java.util.concurrent.atomic.AtomicInteger(0)
    val readerStop = new java.util.concurrent.atomic.AtomicBoolean(false)
    // a reader polls mid-storm: every commit it sees must parse and be
    // internally consistent (version == its slot, base always present)
    val reader = new Thread(() => {
      while (!readerStop.get()) {
        try {
          val cs = CommitLog.commits(table)
          cs.zipWithIndex.foreach { case (c, i) =>
            if (c.version != i.toLong) errs.add(new AssertionError(
              s"reader saw version ${c.version} at slot $i"))
            if (!c.files.contains("base")) errs.add(new AssertionError(
              s"reader saw v${c.version} without the base file"))
          }
        } catch { case e: Throwable => errs.add(e) }
      }
    })
    reader.start()
    val writers = (1 to n).map { i =>
      new Thread(() =>
        try {
          val (_, c) = CommitLog.appendWithRetry(table, Seq(s"w$i"), i * 100L)
          conflicts.addAndGet(c); ()
        } catch { case e: Throwable => errs.add(e); () })
    }
    writers.foreach(_.start()); writers.foreach(_.join(60000))
    readerStop.set(true); reader.join(10000)
    assert(errs.isEmpty, s"failures: ${errs.toArray.mkString("; ")}")

    val cs = CommitLog.commits(table)
    assert(cs.map(_.version) == (0L to n.toLong),
      s"versions not contiguous: ${cs.map(_.version)}")
    val tipFiles = cs.last.files.toSet
    (1 to n).foreach(i => assert(tipFiles.contains(s"w$i"),
      s"writer $i's append was lost (tip: $tipFiles)"))
    cs.sliding(2).foreach {
      case Seq(a, b) => assert(a.files.toSet.subsetOf(b.files.toSet),
        s"v${b.version} dropped files from v${a.version}")
      case _ =>
    }
    TmpDir.delete(table)
  }

  test("stale delete aborts when its read set was compacted away") {
    val table = freshTable()
    CommitLog.appendWithRetry(table, Seq("f1"), 100L) // v1: base, f1
    // a delete prepared against v1 reads {base, f1} …
    // … but a compaction replaces both before it commits
    CommitLog.rewriteWithRetry(table, Seq("base", "f1"), Seq("fc"), 200L)
    intercept[CommitLog.ConcurrentDeleteReadException] {
      CommitLog.deleteWithRetry(table, 1L, Seq("d0"), 300L)
    }
    // re-prepared against the rewrite it lands
    val (v, _) = CommitLog.deleteWithRetry(table, 2L, Seq("d0"), 400L)
    assert(v == 3L)
    assert(CommitLog.tip(table).get.deletes == Seq("d0"))
    TmpDir.delete(table)
  }

  test("rewrite-vs-rewrite: the loser aborts instead of double-compacting") {
    val table = freshTable()
    CommitLog.appendWithRetry(table, Seq("f1"), 100L)
    CommitLog.rewriteWithRetry(table, Seq("base", "f1"), Seq("fc1"), 200L)
    // a second compaction prepared against the same inputs must abort:
    // its inputs are gone from the tip
    intercept[CommitLog.ConcurrentDeleteReadException] {
      CommitLog.rewriteWithRetry(table, Seq("base", "f1"), Seq("fc2"), 300L)
    }
    TmpDir.delete(table)
  }
}

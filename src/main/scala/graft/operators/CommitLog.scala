package graft.operators

import java.nio.file.{Files, Paths, FileAlreadyExistsException}

/** OPTIMISTIC-CONCURRENCY commit protocol for the H-tier JSON commit
  * log (the Delta/Iceberg rule the single-writer H13/H20 lifecycle
  * left open — production lakes break exactly at two writers racing
  * one version slot).
  *
  * Commit = atomically claiming `_log/<v>.json`. The claim primitive
  * is `Files.createLink(target, tmp)`: the content is fully written
  * to a temp file first, then the hard link either creates the
  * version file COMPLETE in one atomic step or throws
  * FileAlreadyExistsException — a reader can never observe a partial
  * commit, and two writers can never both own a version. (On an
  * object store the same role is played by a conditional PUT /
  * put-if-absent; on HDFS by rename-without-overwrite.)
  *
  * Conflict rule (mirrors Delta's ConcurrentAppend/ConcurrentDeleteRead
  * semantics):
  *   - An APPEND has no read set: on losing a slot it REBASES — re-read
  *     the tip, rebuild its file list ON TOP of the new tip (never on
  *     its stale snapshot — that is the lost update), and retry.
  *   - A commit with a READ SET (equality delete, rewrite) must
  *     validate that every file it read is still live at the current
  *     tip; if a concurrent commit removed one (compaction/rewrite),
  *     the operation's premise is gone and it must ABORT loudly —
  *     retrying would silently resurrect or double-delete rows.
  */
object CommitLog {

  /** One parsed commit: version, logical ts, data files, delete files. */
  final case class Commit(version: Long, tsMs: Long,
      files: Seq[String], deletes: Seq[String])

  final class ConcurrentDeleteReadException(msg: String)
      extends RuntimeException(msg)

  private def render(c: Commit): String =
    s"""{"version": ${c.version}, "ts_ms": ${c.tsMs}, "files": [${
      c.files.map("\"" + _ + "\"").mkString(", ")}], "deletes": [${
      c.deletes.map("\"" + _ + "\"").mkString(", ")}]}"""

  private def parse(txt: String): Commit = {
    val v = """"version":\s*(\d+)""".r.findFirstMatchIn(txt).get.group(1).toLong
    val ts = """"ts_ms":\s*(\d+)""".r.findFirstMatchIn(txt).get.group(1).toLong
    def names(section: String): Seq[String] = {
      val i = txt.indexOf(section)
      val seg = txt.substring(i, txt.indexOf(']', i))
      """"([a-z0-9_]+)"""".r.findAllMatchIn(seg).map(_.group(1)).toSeq
        .filterNot(Set(section))
    }
    Commit(v, ts, names("files"), names("deletes"))
  }

  def logDir(table: String): String = s"$table/_log"

  /** All committed versions, sorted. Readers see only fully-written
    * entries (the link is all-or-nothing). */
  def commits(table: String): Seq[Commit] = {
    val d = new java.io.File(logDir(table))
    val fs = Option(d.listFiles()).getOrElse(Array.empty)
    fs.filter(f => f.getName.endsWith(".json") && !f.getName.startsWith("_tmp"))
      .toSeq
      .map(f => parse(Files.readString(f.toPath)))
      .sortBy(_.version)
  }

  def tip(table: String): Option[Commit] = commits(table).lastOption

  /** Atomically claim version `v` with `content`. True = this writer
    * owns the version; false = someone else got there first.
    */
  def tryCommit(table: String, c: Commit): Boolean = {
    val dir = Paths.get(logDir(table))
    Files.createDirectories(dir)
    val tmp = dir.resolve(s"_tmp_${java.util.UUID.randomUUID().toString.take(12)}.json")
    Files.writeString(tmp, render(c))
    try {
      Files.createLink(dir.resolve(s"${c.version}.json"), tmp)
      Files.delete(tmp)
      true
    } catch {
      case _: FileAlreadyExistsException => Files.delete(tmp); false
    }
  }

  /** Commit an APPEND of `newFiles` with optimistic retry: read the
    * tip, propose tip+1 with the tip's state PLUS this writer's files,
    * and on a lost race rebase onto the new tip and try again. Returns
    * (committed version, number of lost races).
    */
  def appendWithRetry(table: String, newFiles: Seq[String], tsMs: Long,
      maxRetries: Int = 64): (Long, Int) = {
    var conflicts = 0
    while (conflicts <= maxRetries) {
      val base = tip(table)
      val next = Commit(base.map(_.version + 1).getOrElse(0L), tsMs,
        base.map(_.files).getOrElse(Seq.empty) ++ newFiles,
        base.map(_.deletes).getOrElse(Seq.empty))
      if (tryCommit(table, next)) return (next.version, conflicts)
      conflicts += 1
    }
    throw new IllegalStateException(
      s"append lost $maxRetries races — livelock or a stuck writer")
  }

  /** Commit a DELETE prepared against `readVersion`, whose read set is
    * that snapshot's data files. Validates at every attempt that each
    * read file is still live at the tip (a concurrent compaction /
    * rewrite that removed one aborts with
    * [[ConcurrentDeleteReadException]] — the Delta rule); slot races
    * against commits that keep the read set intact (plain appends)
    * rebase and retry. Returns (version, conflicts).
    */
  def deleteWithRetry(table: String, readVersion: Long,
      deleteFiles: Seq[String], tsMs: Long, maxRetries: Int = 64): (Long, Int) = {
    val readSet = commits(table).find(_.version == readVersion)
      .getOrElse(throw new IllegalArgumentException(
        s"read version $readVersion is not in the log")).files
    var conflicts = 0
    while (conflicts <= maxRetries) {
      val t = tip(table).getOrElse(throw new IllegalStateException("empty log"))
      val missing = readSet.filterNot(t.files.contains)
      if (missing.nonEmpty)
        throw new ConcurrentDeleteReadException(
          s"read set files $missing were removed by a concurrent commit " +
            s"(tip v${t.version}); the delete's premise is gone — aborting " +
            "instead of corrupting history")
      val next = Commit(t.version + 1, tsMs, t.files, t.deletes ++ deleteFiles)
      if (tryCommit(table, next)) return (next.version, conflicts)
      conflicts += 1
    }
    throw new IllegalStateException(
      s"delete lost $maxRetries races — livelock or a stuck writer")
  }

  /** Commit a COMPACTION replacing `replaced` with `rewritten` (same
    * rows, new layout). Read-set = `replaced`; aborts like a delete if
    * a concurrent commit already removed one of them.
    */
  def rewriteWithRetry(table: String, replaced: Seq[String],
      rewritten: Seq[String], tsMs: Long, maxRetries: Int = 64): (Long, Int) = {
    var conflicts = 0
    while (conflicts <= maxRetries) {
      val t = tip(table).getOrElse(throw new IllegalStateException("empty log"))
      val missing = replaced.filterNot(t.files.contains)
      if (missing.nonEmpty)
        throw new ConcurrentDeleteReadException(
          s"rewrite inputs $missing vanished under a concurrent commit — aborting")
      val next = Commit(t.version + 1, tsMs,
        t.files.filterNot(replaced.contains) ++ rewritten, t.deletes)
      if (tryCommit(table, next)) return (next.version, conflicts)
      conflicts += 1
    }
    throw new IllegalStateException(
      s"rewrite lost $maxRetries races — livelock or a stuck writer")
  }
}

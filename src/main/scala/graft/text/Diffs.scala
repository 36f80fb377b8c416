package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Unified-diff parsing — commit-data corpora (code-review and
  * commit-message datasets) ship patches, and a pipeline filters on
  * their shape: files touched, hunks, added/removed line counts.
  * Standard `diff -u` / `git diff` framing:
  *
  *  - a file starts at `--- a/old` + `+++ b/new` (the reported path
  *    is the new side, `b/` prefix stripped; `/dev/null` new sides
  *    keep the old path — deletions still have a path);
  *  - `@@ -l[,n] +l[,n] @@` hunk headers are validated by shape, not
  *    trusted blindly: a `@@` line that does not parse rejects the
  *    whole diff (None — corrupt patches must not mint junk counts);
  *  - within hunks, `+`/`-` first columns count as added/removed
  *    (`+++`/`---` file markers excluded by position: they only occur
  *    at file boundaries), context and `\ No newline` lines don't.
  *
  * Add/remove lines OUTSIDE any hunk, or hunks outside any file,
  * reject. Pure per-row map work.
  */
object Diffs {

  final case class FileDiff(path: String, n_hunks: Int, added: Int,
                            removed: Int)

  private val HunkHeader =
    "^@@ -\\d+(,\\d+)? \\+\\d+(,\\d+)? @@.*$".r

  def parse(diff: String): Option[Seq[FileDiff]] = {
    if (diff == null) return None
    val out = Vector.newBuilder[FileDiff]
    var path: String = null
    var hunks = 0
    var added = 0
    var removed = 0
    var inHunk = false
    var pendingOld: String = null // saw "--- ", waiting for "+++ "
    def flush(): Unit = {
      if (path != null) out += FileDiff(path, hunks, added, removed)
      path = null; hunks = 0; added = 0; removed = 0; inHunk = false
    }
    val lines = diff.split("\n", -1)
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      if (l.startsWith("--- ")) {
        pendingOld = l.substring(4).trim
        inHunk = false
      } else if (l.startsWith("+++ ")) {
        if (pendingOld == null) return None // +++ without ---
        flush()
        val newSide = l.substring(4).trim
        path = if (newSide == "/dev/null") stripAb(pendingOld)
          else stripAb(newSide)
        pendingOld = null
      } else if (l.startsWith("@@")) {
        if (path == null) return None // hunk outside a file
        if (HunkHeader.findFirstIn(l).isEmpty) return None
        hunks += 1
        inHunk = true
      } else if (l.startsWith("+")) {
        if (!inHunk) return None
        added += 1
      } else if (l.startsWith("-")) {
        if (!inHunk) return None
        removed += 1
      } else {
        // context, index/meta lines, "\ No newline", blank tail
        ()
      }
      i += 1
    }
    flush()
    Some(out.result())
  }

  private def stripAb(p: String): String =
    if (p.startsWith("a/") || p.startsWith("b/")) p.substring(2) else p

  /** diff → array<struct<path, n_hunks, added, removed>>; null when
    * structurally malformed. */
  def fileDiffsCol(c: Column): Column =
    udf { s: String =>
      parse(s).map(_.map(f => (f.path, f.n_hunks, f.added, f.removed)))
    }.apply(c)
}

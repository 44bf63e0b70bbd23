package graft.plans

/**
 * Static source audit for the UNPARTITIONED-window bug class — the
 * structural companion to [[IterationAudit]]: a
 * `Window.orderBy(...)` (or zero-arg `Window.partitionBy()`) frame
 * moves every row it sees onto ONE reducer, so it is only legal over
 * a table whose size is bounded by something other than the corpus
 * (quantized value cells, a calendar grid, |rules|, a top-k). The
 * r8 `mannWhitney` defect was exactly an unpartitioned rank window
 * over full-precision value cells: correct at test SF, a
 * single-reducer global sort at 100 TB on a continuous metric.
 *
 * The audit scans operator SOURCE (not plans — the hazard is the
 * frame's domain, which the optimizer can't see) for window frames
 * built without partition columns, and requires each site to carry a
 * `bounded-window: <tag>` marker comment within the preceding lines,
 * where the tag names the documented domain bound from
 * [[allowedTags]]. A new unpartitioned window without a marker — or
 * with a tag outside the vocabulary — fails `WindowAuditSpec`, which
 * also proves the scanner catches a deliberately planted unbounded
 * window (the canary).
 */
object WindowAudit {

  /** One unpartitioned-window occurrence: the 1-based line of the
    * `Window` token and the tag found in the preceding marker (None =
    * unannotated — an audit failure). */
  final case class Site(file: String, line: Int, tag: Option[String])

  /** The documented bounded-domain vocabulary. Every tag names WHY the
    * frame the window runs over cannot grow with the corpus. */
  val allowedTags: Set[String] = Set(
    // ("quantized-cells" — a frame bounded by the metric's RANGE via
    // 6-dp snapping — was RETIRED in r10: the bound was per-unit-of-
    // range, so wide-range continuous metrics degenerated to one
    // reducer. Rank/risk-set walks now go through [[CumWalk]], whose
    // only unpartitioned window is its fixed-fanout offsets table.)
    // a naturally discrete, range-bounded metric: integer day counts,
    // 2-dp currency, per-day slopes over a calendar grid
    "integer-cells",
    // one row per calendar day / window in the observation span
    "calendar-grid",
    // a declared grouping DIMENSION (catalog, segment, event type) the
    // caller passes as the unit of analysis — documented in the
    // operator scaladoc as dimension-sized, never per-corpus-row
    "key-domain",
    // |rules| / |hypotheses| / |domains| / |thresholds| rows
    "rules",
    // the frame follows a limit(k) / TakeOrderedAndProject, so it
    // holds at most k rows
    "topk",
    // a constant-size domain fixed by the algorithm (256 byte buckets,
    // PQ codebook entries, subspace codes)
    "fixed-fanout",
    // the frame's row count was COUNTED on a materialized table at
    // plan-build time and is at or below the configured cutoff
    // (CumWalk's small-cell path; larger tables take the bucketed
    // two-pass, so no reducer ever sees more than the cutoff)
    "counted-cells",
    // gate-local fixture scaffolding, documented non-production
    "test-scaffold")

  // `Window` token (not the tail of another identifier) followed —
  // possibly across a line break — by `.orderBy` or a ZERO-ARG
  // `.partitionBy()`; `Window.partitionBy(col…)` deliberately does
  // not match. Matching runs on COMMENT-STRIPPED source so prose
  // mentioning the API doesn't count as a site; markers are comments,
  // so they are searched on the RAW lines.
  private val winRe =
    """(?<![A-Za-z0-9_])Window\s*\.\s*(?:orderBy|partitionBy\(\s*\))""".r
  private val tagRe = """bounded-window:\s*([a-z][a-z-]*)""".r

  /** Lines a marker may precede its site by (markers annotate the
    * enclosing val/expression, often shared by an adjacent
    * wCum/wAll pair). */
  val markerReach = 8

  /** Blanks out `//` tails, `/*…*/` blocks, string bodies, and char
    * literals, preserving every line break so offsets keep their line
    * numbers. */
  // A Scala CHAR literal: '\uXXXX', an escaped char, or any single
  // non-quote char. Matched BEFORE the string tracker sees the quote so
  // a literal like `case '"' =>` (StageCompiler has one) can't flip the
  // mode and blank — fail open on — the code that follows it.
  private val charLitRe =
    """'(?:\\u[0-9a-fA-F]{4}|\\[btnfr"'\\]|[^'\\\n])'""".r

  private def stripComments(src: String): String = {
    val out = new StringBuilder(src.length)
    var i = 0
    var mode = 0 // 0 code, 1 line comment, 2 block comment, 3 string, 4 triple-quoted
    var depth = 0
    while (i < src.length) {
      val c = src.charAt(i)
      val next = if (i + 1 < src.length) src.charAt(i + 1) else ' '
      mode match {
        case 0 =>
          if (c == '/' && next == '/') { mode = 1; out += ' '; out += ' '; i += 2 }
          else if (c == '/' && next == '*') { mode = 2; depth = 1; out += ' '; out += ' '; i += 2 }
          else if (c == '"' && i + 2 < src.length && next == '"' &&
            src.charAt(i + 2) == '"') { mode = 4; out ++= "\"\"\""; i += 3 }
          else if (c == '"') { mode = 3; out += c; i += 1 }
          else if (c == '\'') {
            // char literal (incl. '"' and ' ') — blank its body so an
            // embedded quote can't desynchronize the string tracker; a
            // lone ' (symbol literal, quasiquote) falls through as code
            charLitRe.findPrefixMatchOf(src.subSequence(i, src.length)) match {
              case Some(m) => out ++= " " * m.end; i += m.end
              case None => out += c; i += 1
            }
          }
          else { out += c; i += 1 }
        case 1 =>
          if (c == '\n') { mode = 0; out += c } else out += ' '
          i += 1
        case 2 =>
          if (c == '/' && next == '*') { depth += 1; out += ' '; out += ' '; i += 2 }
          else if (c == '*' && next == '/') {
            depth -= 1; out += ' '; out += ' '; i += 2
            if (depth == 0) mode = 0
          }
          else { out += (if (c == '\n') c else ' '); i += 1 }
        case 3 =>
          if (c == '\\') { out += c; out += (if (next == ' ') ' ' else next); i += 2 }
          else if (c == '"') { mode = 0; out += c; i += 1 }
          else { out += (if (c == '\n') c else ' '); i += 1 }
        case _ => // triple-quoted: ends at the first """ whose follower
          // is not another " (Scala's greedy-quote rule); quote PARITY
          // inside is free, so embedded SQL "..." text can't flip the
          // tracker and blank subsequent real code
          if (c == '"' && i + 2 < src.length && next == '"' &&
            src.charAt(i + 2) == '"' &&
            (i + 3 >= src.length || src.charAt(i + 3) != '"')) {
            mode = 0; out ++= "\"\"\""; i += 3
          }
          else { out += (if (c == '\n') c else ' '); i += 1 }
      }
    }
    out.toString
  }

  /** Scan one source text for unpartitioned-window sites. */
  def scan(file: String, content: String): Seq[Site] = {
    val rawLines = content.split("\n", -1)
    val stripped = stripComments(content)
    // character offset -> 1-based line number
    val starts = rawLines.scanLeft(0)(_ + _.length + 1)
    def lineOf(off: Int): Int = {
      var lo = 0; var hi = rawLines.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) / 2
        if (starts(mid) <= off) lo = mid else hi = mid - 1
      }
      lo + 1
    }
    winRe.findAllMatchIn(stripped).map { m =>
      val ln = lineOf(m.start)
      val from = math.max(0, ln - 1 - markerReach)
      val window = rawLines.slice(from, ln).mkString("\n")
      val tag = tagRe.findAllMatchIn(window).toSeq.lastOption.map(_.group(1))
      Site(file, ln, tag)
    }.toSeq
  }

  /** Scan every `.scala` file under `root` (recursively). */
  def scanTree(root: java.io.File): Seq[Site] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.sortBy(_.getName).flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f)
      else Seq.empty
    walk(root).flatMap { f =>
      val src = scala.io.Source.fromFile(f, "UTF-8")
      val content = try src.mkString finally src.close()
      scan(root.toPath.relativize(f.toPath).toString, content)
    }
  }
}

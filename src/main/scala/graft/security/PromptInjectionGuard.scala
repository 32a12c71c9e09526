package graft.security

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Prompt-injection guard for query results consumed by AI agents.
  *
  * Port of the reference's per-batch scan
  * (/root/reference/python/src/connection.rs:27-162): a case-insensitive
  * multi-pattern matcher over every string column, bounded to the first
  * 8 KiB of each cell, with disabled / dry-run / enforce modes. The
  * matcher here is an Aho–Corasick automaton built once per pattern set.
  *
  * Two surfaces:
  *  - `findFirst(rows, schema)`: driver-side scan of collected rows (the
  *    serving-layer hook — results headed to an agent are bounded, so a
  *    driver scan matches the reference's post-collect placement);
  *  - `violations(df)`: a distributed variant flagging offending rows
  *    with the matched pattern, for bulk auditing at scale.
  */
object PromptInjectionGuard {

  /** DEFAULT_INJECTION_PATTERNS (connection.rs:27-35). */
  val DefaultPatterns: Seq[String] = Seq(
    "ignore previous instructions",
    "disregard previous instructions",
    "system prompt",
    "developer message",
    "begin system prompt",
    "begin developer message",
    "you are chatgpt")

  val MaxScanBytesPerCell = 8 * 1024

  sealed trait GuardMode
  case object Disabled extends GuardMode
  case object DryRun extends GuardMode
  case object Enforce extends GuardMode

  object GuardMode {
    def parse(s: String): GuardMode = s.trim.toLowerCase match {
      case "enforce" => Enforce
      case "dry_run" | "dryrun" => DryRun
      case "disabled" | "off" | "0" => Disabled
      case _ => DryRun // reference default
    }
  }

  final case class Finding(column: String, pattern: String)
  final case class InjectionDetected(finding: Finding)
      extends RuntimeException(
        s"prompt injection pattern detected in column ${finding.column}: " +
          s"'${finding.pattern}'")

  // ----------------------------------------------------- Aho–Corasick
  /** Minimal Aho–Corasick over lowercase byte patterns. */
  final class Automaton(patterns: Seq[String]) {
    private val pats = patterns.map(_.toLowerCase)
    // trie arrays
    private val alphabet = 256
    private var nodes = 1
    private val children = scala.collection.mutable.ArrayBuffer(
      Array.fill(alphabet)(-1))
    private val fail = scala.collection.mutable.ArrayBuffer(0)
    private val out = scala.collection.mutable.ArrayBuffer[Int](-1)

    pats.zipWithIndex.foreach { case (p, id) =>
      var cur = 0
      p.getBytes("UTF-8").foreach { b =>
        val c = b & 0xff
        if (children(cur)(c) == -1) {
          children(cur)(c) = nodes
          children += Array.fill(alphabet)(-1)
          fail += 0
          out += -1
          nodes += 1
        }
        cur = children(cur)(c)
      }
      out(cur) = id
    }
    // BFS failure links
    locally {
      val q = scala.collection.mutable.Queue[Int]()
      (0 until alphabet).foreach { c =>
        val nxt = children(0)(c)
        if (nxt != -1) { fail(nxt) = 0; q.enqueue(nxt) }
        else children(0)(c) = 0
      }
      while (q.nonEmpty) {
        val u = q.dequeue()
        (0 until alphabet).foreach { c =>
          val v = children(u)(c)
          if (v != -1) {
            fail(v) = children(fail(u))(c)
            if (out(v) == -1) out(v) = out(fail(v))
            q.enqueue(v)
          } else children(u)(c) = children(fail(u))(c)
        }
      }
    }

    /** First matching pattern id in (lowercased) text, or -1. */
    def firstMatch(text: String): Int = {
      val bytes = text.toLowerCase.getBytes("UTF-8")
      val n = math.min(bytes.length, MaxScanBytesPerCell)
      var state = 0
      var i = 0
      while (i < n) {
        state = children(state)(bytes(i) & 0xff)
        if (out(state) != -1) return out(state)
        i += 1
      }
      -1
    }
  }

  private lazy val defaultAutomaton = new Automaton(DefaultPatterns)

  /** Driver-side scan of collected rows (serving-layer hook). */
  def findFirst(rows: Seq[Row],
      patterns: Seq[String] = DefaultPatterns): Option[Finding] = {
    val auto = if (patterns == DefaultPatterns) defaultAutomaton
      else new Automaton(patterns)
    rows.iterator.flatMap { r =>
      r.schema.fields.iterator.zipWithIndex.collect {
        case (f, i) if f.dataType == StringType && !r.isNullAt(i) =>
          (f.name, r.getString(i))
      }.flatMap { case (name, text) =>
        val m = auto.firstMatch(text)
        if (m >= 0) Some(Finding(name, patterns(m))) else None
      }
    }.nextOption()
  }

  /** Apply the guard to rows headed to an agent. Enforce throws; DryRun
    * returns the finding for a warning channel; Disabled no-ops. */
  def guard(rows: Seq[Row], mode: GuardMode): Option[Finding] = mode match {
    case Disabled => None
    case DryRun => findFirst(rows)
    case Enforce =>
      findFirst(rows) match {
        case Some(f) => throw InjectionDetected(f)
        case None => None
      }
  }

  /** Same contract over pre-formatted text cells (the trace report's
    * sample) — every outgoing data rendering goes through the guard,
    * whatever its shape. */
  def guardCells(cells: Seq[Array[String]], mode: GuardMode): Option[Finding] = {
    if (mode == Disabled) return None
    val auto = new Automaton(DefaultPatterns)
    val finding = cells.iterator.flatMap { row =>
      row.iterator.flatMap { cell =>
        val m = auto.firstMatch(cell)
        if (m >= 0) Some(Finding("(trace sample)", DefaultPatterns(m))) else None
      }
    }.nextOption()
    mode match {
      case Enforce => finding.foreach(f => throw InjectionDetected(f)); None
      case _ => finding
    }
  }

  /** Distributed audit: rows whose string columns match a pattern, tagged
    * with the column that matched. Uses codegen'd `contains` on lowercase
    * text — the automaton matters driver-side; at scale the per-pattern
    * scan is a single predicate pass. */
  def violations(df: DataFrame,
      patterns: Seq[String] = DefaultPatterns): DataFrame = {
    val stringCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    val hits = stringCols.map { c =>
      val lc = lower(substring(col(c), 1, MaxScanBytesPerCell))
      val matched = patterns.map(p => when(lc.contains(p.toLowerCase), lit(p)))
        .reduce((a, b) => coalesce(a, b))
      when(matched.isNotNull, concat(lit(c + ":"), matched))
    }
    if (hits.isEmpty) df.limit(0).withColumn("injection_hits", lit(null).cast("string"))
    else df.withColumn("injection_hits",
        array_join(filter(array(hits: _*), x => x.isNotNull), "; "))
      .filter(col("injection_hits") =!= "")
  }
}

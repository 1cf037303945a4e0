package graft.format

import java.util.regex.Pattern

/** Compiler from an nginx `log_format` template to an anchored regular
  * expression, one capture group per `$variable`.
  *
  * Behavioral port of the reference compiler (see
  * `/root/reference/pkg/nginx/template.go:43-57`): each `$var` becomes a
  * group `([^D]*)` where `D` is the literal character that immediately
  * follows the variable in the template; literals are quoted verbatim; the
  * whole pattern is anchored at `^`. Adjacent variables (`$a$b<delim>`)
  * collapse to two groups that share the downstream delimiter — the same
  * observable behavior the reference achieves with its placeholder trick
  * (`template.go:44-51`). A variable at end-of-format uses the space
  * delimiter (the reference appends `" "` before compiling,
  * `template.go:52`).
  *
  * Unlike the reference (Go named groups `(?P<v>...)`), we use positional
  * groups and keep `fields` in template order — Java named groups reject
  * `_`, which nginx variable names contain.
  */
final case class LogTemplate(format: String, fields: Vector[String], regex: String,
    steps: Vector[LogTemplate.Step]) {
  @transient lazy val pattern: Pattern = Pattern.compile(regex)

  /** True when every variable delimiter is ASCII — the condition under
    * which the byte-scanner fast path ([[graft.functions.ParseLogTemplate]])
    * is exactly equivalent to the compiled regex: scanning for an ASCII
    * delimiter byte can never land inside a UTF-8 multi-byte sequence, so
    * byte search ≡ the regex's `[^d]*` character semantics.
    */
  lazy val scannable: Boolean = steps.forall {
    case LogTemplate.VarStep(d, _) => d < 128
    case _                         => true
  }

  /** Index of a field's capture group (1-based), -1 if absent. */
  def groupIndex(field: String): Int = fields.indexOf(field) + 1

  /** Driver-side parse (used by tests and config validation); the
    * distributed path uses the same `regex` via Catalyst expressions.
    * Returns None when the line does not match the format
    * (reference: error "does not match given format",
    * `template.go:25-28` → row dropped).
    */
  def parse(line: String): Option[Map[String, String]] = {
    val m = pattern.matcher(line)
    if (!m.lookingAt()) None
    else Some(fields.zipWithIndex.map { case (f, i) => f -> m.group(i + 1) }.toMap)
  }
}

object LogTemplate {

  /** One instruction of the flattened scan program equivalent to the
    * compiled regex (see [[LogTemplate.scannable]] for the equivalence
    * argument):
    *   - [[LitStep]]: the line must contain exactly these bytes here;
    *   - [[VarStep]] with `hasLitAfter`: the group runs to the FIRST
    *     occurrence of `delim` (greedy `[^d]*` never backtracks past its
    *     exclusion — the following literal starts with `delim`, so any
    *     shorter match fails its first byte);
    *   - [[VarStep]] without `hasLitAfter` (template tail): the group takes
    *     the REST of the line, failing if `delim` occurs in it (the
    *     anchored match must consume every remaining char through
    *     `[^d]*` groups only).
    */
  sealed trait Step
  final case class LitStep(s: String) extends Step
  final case class VarStep(delim: Char, hasLitAfter: Boolean) extends Step

  private val VarChar = "[A-Za-z0-9_]"

  private sealed trait Tok
  private final case class Lit(s: String) extends Tok
  private final case class Var(name: String) extends Tok

  private def tokenize(format: String): List[Tok] = {
    val toks = List.newBuilder[Tok]
    val lit = new StringBuilder
    var i = 0
    while (i < format.length) {
      val c = format.charAt(i)
      if (c == '$' && i + 1 < format.length && format.charAt(i + 1).toString.matches(VarChar)) {
        if (lit.nonEmpty) { toks += Lit(lit.toString); lit.clear() }
        var j = i + 1
        while (j < format.length && format.charAt(j).toString.matches(VarChar)) j += 1
        toks += Var(format.substring(i + 1, j))
        i = j
      } else { lit.append(c); i += 1 }
    }
    if (lit.nonEmpty) toks += Lit(lit.toString)
    toks.result()
  }

  /** Escape a single char for use inside a regex character class. */
  private def classEscape(c: Char): String = c match {
    case ']' | '\\' | '^' | '-' | '[' | '&' => "\\" + c
    case _                                  => c.toString
  }

  def compile(format: String): LogTemplate = {
    // Reference appends a trailing space so a template-final variable gets
    // a delimiter (template.go:52); it then trims the trailing " " from the
    // compiled regex (template.go:57). We reproduce by defaulting the
    // delimiter of a final variable to ' ' and not emitting the trailer.
    val toks = tokenize(format)
    // Resolve each Var's delimiter: first char of the next Lit; if the next
    // token is another Var, share that Var's resolved delimiter (adjacency
    // behavior); end-of-format → ' '.
    val delims = new Array[Char](toks.length)
    var next: Char = ' '
    for (i <- toks.indices.reverse) toks(i) match {
      case Lit(s) => delims(i) = s.charAt(0); next = s.charAt(0)
      case Var(_) => delims(i) = next
    }
    val sb = new StringBuilder("^")
    val fields = Vector.newBuilder[String]
    val steps = Vector.newBuilder[Step]
    toks.zipWithIndex.foreach {
      case (Lit(s), _) =>
        sb.append(Pattern.quote(s))
        steps += LitStep(s)
      case (Var(name), i) =>
        fields += name
        sb.append("([^").append(classEscape(delims(i))).append("]*)")
        steps += VarStep(delims(i),
          hasLitAfter = toks.drop(i + 1).exists(_.isInstanceOf[Lit]))
    }
    LogTemplate(format, fields.result(), sb.toString, steps.result())
  }
}

/** Go reference-time layout (`02/Jan/2006:15:04:05 -0700`) → JDK
  * `DateTimeFormatter` pattern translator. Only layouts reachable from the
  * reference's config need to work (`log_time_format`,
  * `/root/reference/config/config.go:19`; defaults
  * `/root/reference/pkg/nginx/caster.go:10-12`); unknown numeric tokens
  * fail fast.
  */
object GoTimeLayout {
  private val tokens: Seq[(String, String)] = Seq(
    "2006"    -> "yyyy",
    "01"      -> "MM",
    "Jan"     -> "MMM",
    "January" -> "MMMM",
    "Monday"  -> "EEEE",
    "Mon"     -> "EEE",
    "02"      -> "dd",
    "_2"      -> "d",
    "15"      -> "HH",
    "03"      -> "hh",
    "04"      -> "mm",
    "05"      -> "ss",
    ".000"    -> ".SSS",
    ".000000" -> ".SSSSSS",
    "-07:00"  -> "XXX",
    "-0700"   -> "Z",
    "Z07:00"  -> "XXX",
    "Z0700"   -> "X",
    "MST"     -> "zzz",
    "PM"      -> "a",
    "06"      -> "yy"
  ).sortBy(-_._1.length)

  def toJava(goLayout: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < goLayout.length) {
      tokens.find { case (go, _) => goLayout.startsWith(go, i) } match {
        case Some((go, java)) => sb.append(java); i += go.length
        case None =>
          val c = goLayout.charAt(i)
          if (c.isDigit)
            throw new IllegalArgumentException(
              s"unsupported Go time layout token at $i in '$goLayout'")
          else if (c.isLetter) sb.append('\'').append(c).append('\'')
          else sb.append(c)
          i += 1
      }
    }
    // merge adjacent quoted letters 'T''Z' → 'TZ'
    sb.toString.replace("''", "")
  }
}

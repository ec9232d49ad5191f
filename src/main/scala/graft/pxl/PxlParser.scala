package graft.pxl

/** Minimal PxL (restricted Python) front-end — parser half.
  *
  * The reference parses PxL with libpypa and walks the AST in
  * src/carnot/planner/compiler/ast_visitor.h:140-415: module, assign
  * (name / attribute / subscript targets), expression statements, calls
  * with args+kwargs, attributes, subscripts, lists/tuples, binops and
  * comparisons — no loops, no classes, no defs in the subset the bundled
  * scripts use. This parser covers exactly that subset: a flat statement
  * list with implicit line-joining inside brackets (how multi-line
  * `agg(...)` calls appear in every script).
  */
object PxlParser {

  // ---- AST -----------------------------------------------------------
  sealed trait Expr
  final case class Str(s: String) extends Expr
  final case class IntLit(v: Long) extends Expr
  final case class FloatLit(v: Double) extends Expr
  final case class BoolLit(v: Boolean) extends Expr
  final case class NameE(n: String) extends Expr
  final case class AttrE(base: Expr, name: String) extends Expr
  final case class SubE(base: Expr, index: Expr) extends Expr
  final case class CallE(fn: Expr, args: Seq[Expr], kwargs: Seq[(String, Expr)]) extends Expr
  final case class ListE(xs: Seq[Expr]) extends Expr
  final case class DictE(entries: Seq[(Expr, Expr)]) extends Expr
  final case class BinE(op: String, l: Expr, r: Expr) extends Expr
  final case class UnaryE(op: String, e: Expr) extends Expr

  sealed trait Stmt
  final case class Assign(target: Expr, value: Expr) extends Stmt
  final case class ExprStmt(e: Expr) extends Stmt
  final case class ImportS(module: String) extends Stmt
  /** paramTypes holds the declared annotation per param ("str", "int",
    * "float", "px.Namespace", ...) or None — the runner coerces exec_funcs
    * string args by it, like compiler.cc ProcessExecFuncs coerces by the
    * declared arg type.
    */
  final case class DefS(name: String, params: Seq[String],
      paramTypes: Seq[Option[String]], body: Seq[Stmt]) extends Stmt
  final case class ReturnS(e: Expr) extends Stmt

  // ---- tokenizer -----------------------------------------------------
  private sealed trait Tok
  private case class TName(s: String) extends Tok
  private case class TNum(s: String) extends Tok
  private case class TStr(s: String) extends Tok
  private case class TOp(s: String) extends Tok
  /** End of logical line; carries the indent of the NEXT real line
    * (blank and comment-only lines are folded away).
    */
  private case class TNewline(nextIndent: Int) extends Tok
  private case object TEof extends Tok

  /** Tokens plus, per token, whether it is the first token on its
    * physical source line — callArgs uses this to accept an omitted
    * argument comma only at a line break (five bundled reference
    * scripts carry that upstream typo, e.g. services.pxl:132-133)
    * while still rejecting same-line `f(a b)`.
    */
  private def tokenize(src: String): (Vector[Tok], Vector[Boolean]) = {
    val out = Vector.newBuilder[Tok]
    val lineStart = Vector.newBuilder[Boolean]
    var sawNewline = true
    def emit(t: Tok): Unit = { out += t; lineStart += sawNewline; sawNewline = false }
    var i = 0; var depth = 0
    val n = src.length
    def peek(k: Int = 0): Char = if (i + k < n) src(i + k) else ' '
    // Indent of the next non-blank, non-comment-only line at/after j0.
    def nextIndentFrom(j0: Int): Int = {
      var j = j0
      while (j < n) {
        var k = j
        while (k < n && (src(k) == ' ' || src(k) == '\t' || src(k) == '\r')) k += 1
        if (k >= n) return 0
        if (src(k) == '\n') j = k + 1
        else if (src(k) == '#') { while (k < n && src(k) != '\n') k += 1; j = k + 1 }
        else return k - j
      }
      0
    }
    while (i < n) {
      val c = src(i)
      if (c == '#') { while (i < n && src(i) != '\n') i += 1 }
      else if (c == '\n') {
        if (depth == 0) emit(TNewline(nextIndentFrom(i + 1)))
        sawNewline = true
        i += 1
      }
      else if (c == ' ' || c == '\t' || c == '\r') i += 1
      else if (c == '\\' && peek(1) == '\n') i += 2 // explicit continuation
      else if ((c == '\'' || c == '"') && peek(1) == c && peek(2) == c) {
        // triple-quoted string (docstrings)
        val q = c; val sb = new StringBuilder; i += 3
        while (i + 2 < n && !(src(i) == q && src(i + 1) == q && src(i + 2) == q)) {
          sb += src(i); i += 1
        }
        i += 3
        emit(TStr(sb.toString))
      }
      else if (c == '\'' || c == '"') {
        val q = c; val sb = new StringBuilder; i += 1
        while (i < n && src(i) != q) {
          if (src(i) == '\\' && i + 1 < n) { sb += src(i + 1); i += 2 }
          else { sb += src(i); i += 1 }
        }
        i += 1
        emit(TStr(sb.toString))
      }
      else if (c.isDigit || (c == '.' && peek(1).isDigit)) {
        val s = i
        while (i < n && (src(i).isDigit || src(i) == '.' || src(i) == 'e' ||
          src(i) == 'E' || ((src(i) == '+' || src(i) == '-') &&
            (src(i - 1) == 'e' || src(i - 1) == 'E')))) i += 1
        emit(TNum(src.substring(s, i)))
      }
      else if ((c == 'r' || c == 'R') && (peek(1) == '\'' || peek(1) == '"')) {
        // raw string literal: backslashes are literal (regex patterns)
        val q = peek(1); val sb = new StringBuilder; i += 2
        while (i < n && src(i) != q) { sb += src(i); i += 1 }
        i += 1
        emit(TStr(sb.toString))
      }
      else if (c.isLetter || c == '_') {
        val s = i
        while (i < n && (src(i).isLetterOrDigit || src(i) == '_')) i += 1
        emit(TName(src.substring(s, i)))
      }
      else {
        if (c == '(' || c == '[' || c == '{') depth += 1
        if (c == ')' || c == ']' || c == '}') depth -= 1
        val two = if (i + 1 < n) src.substring(i, i + 2) else ""
        if (Set("==", "!=", ">=", "<=", "//", "**")(two)) { emit(TOp(two)); i += 2 }
        else { emit(TOp(c.toString)); i += 1 }
      }
    }
    emit(TNewline(0)); emit(TEof)
    (out.result(), lineStart.result())
  }

  // ---- parser --------------------------------------------------------
  final class ParseError(msg: String) extends RuntimeException(msg)

  def parse(src: String): Seq[Stmt] = {
    val (toks, startsLine) = tokenize(src)
    var p = 0
    def cur: Tok = toks(p)
    def bump(): Tok = { val t = toks(p); p += 1; t }
    def expectOp(op: String): Unit = cur match {
      case TOp(`op`) => p += 1
      case other => throw new ParseError(s"expected '$op', got $other")
    }

    def atom(): Expr = bump() match {
      case TStr(s) =>
        // Python adjacent-string-literal concatenation: 'a' 'b' == 'ab'
        var acc = s
        var more = true
        while (more) cur match {
          case TStr(s2) => acc += s2; p += 1
          case _ => more = false
        }
        Str(acc)
      case TNum(s) =>
        if (s.exists(ch => ch == '.' || ch == 'e' || ch == 'E')) FloatLit(s.toDouble)
        else IntLit(s.toLong)
      case TName("True") => BoolLit(true)
      case TName("False") => BoolLit(false)
      case TName(n) => NameE(n)
      case TOp("(") =>
        val xs = exprList(")")
        expectOp(")")
        if (xs.length == 1) xs.head else ListE(xs) // tuple == list here
      case TOp("[") =>
        val xs = exprList("]")
        expectOp("]")
        ListE(xs)
      case TOp("{") =>
        val entries = Seq.newBuilder[(Expr, Expr)]
        var first = true
        while (cur != TOp("}")) {
          if (!first) expectOp(",")
          first = false
          if (cur != TOp("}")) {
            val k = expr(); expectOp(":"); entries += (k -> expr())
          }
        }
        expectOp("}")
        DictE(entries.result())
      case other => throw new ParseError(s"unexpected token $other")
    }

    def exprList(close: String): Seq[Expr] = {
      val xs = Seq.newBuilder[Expr]
      var first = true
      while (cur != TOp(close)) {
        if (!first) expectOp(",")
        first = false
        if (cur == TOp(close)) return xs.result() // trailing comma
        xs += expr()
      }
      xs.result()
    }

    def callArgs(): (Seq[Expr], Seq[(String, Expr)]) = {
      val args = Seq.newBuilder[Expr]; val kwargs = Seq.newBuilder[(String, Expr)]
      var first = true
      while (cur != TOp(")")) {
        // Strict comma between same-line arguments (a typo like f(a b)
        // must not silently become two args); an omitted comma is
        // accepted only at a line break — five bundled reference scripts
        // carry that upstream typo (e.g. services.pxl:132-133).
        if (!first) {
          if (cur == TOp(",")) p += 1
          else if (!startsLine(p))
            throw new ParseError(s"expected ',' between arguments, got $cur")
        }
        first = false
        if (cur == TOp(")")) { expectOp(")"); return (args.result(), kwargs.result()) }
        (cur, toks(p + 1)) match {
          case (TName(k), TOp("=")) if toks(p + 2) != TOp("=") =>
            p += 2; kwargs += (k -> expr())
          case _ => args += expr()
        }
      }
      expectOp(")")
      (args.result(), kwargs.result())
    }

    def postfix(): Expr = {
      var e = atom()
      var done = false
      while (!done) cur match {
        case TOp(".") =>
          p += 1
          e = bump() match {
            case TName(nm) => AttrE(e, nm)
            case other => throw new ParseError(s"expected attribute name, got $other")
          }
        case TOp("(") => p += 1; val (a, k) = callArgs(); e = CallE(e, a, k)
        case TOp("[") =>
          p += 1
          val xs = exprList("]")
          expectOp("]")
          e = SubE(e, if (xs.length == 1) xs.head else ListE(xs))
        case _ => done = true
      }
      e
    }

    def unary(): Expr = cur match {
      case TOp("-") => p += 1; UnaryE("-", unary())
      case _ => postfix()
    }

    def mul(): Expr = {
      var e = unary()
      var going = true
      while (going) cur match {
        case TOp(op @ ("*" | "/" | "%" | "//")) => p += 1; e = BinE(op, e, unary())
        case _ => going = false
      }
      e
    }

    def add(): Expr = {
      var e = mul()
      var going = true
      while (going) cur match {
        case TOp(op @ ("+" | "-")) => p += 1; e = BinE(op, e, mul())
        case _ => going = false
      }
      e
    }

    def cmp(): Expr = {
      var e = add()
      var going = true
      while (going) cur match {
        case TOp(op @ ("==" | "!=" | ">=" | "<=" | ">" | "<")) =>
          p += 1; e = BinE(op, e, add())
        case _ => going = false
      }
      e
    }

    // Python precedence: or < and < not < comparison — `not x == y`
    // negates the comparison, not x.
    def notE(): Expr = cur match {
      case TName("not") => p += 1; UnaryE("not", notE())
      case _ => cmp()
    }

    def andE(): Expr = {
      var e = notE()
      while (cur == TName("and")) { p += 1; e = BinE("and", e, notE()) }
      e
    }

    def expr(): Expr = {
      var e = andE()
      while (cur == TName("or")) { p += 1; e = BinE("or", e, andE()) }
      e
    }

    // Indent of the line the NEXT statement starts on; updated as each
    // TNewline is consumed (module statements sit at indent 0, a def
    // body's statements at a deeper indent — that's the whole block
    // structure the subset needs; ast_visitor.h has no nested scopes
    // beyond function defs either).
    var lineIndent = 0
    def eatNewline(): Unit = cur match {
      case TNewline(ni) => lineIndent = ni; p += 1
      case TEof =>
      case other => throw new ParseError(s"expected end of statement, got $other")
    }

    def defStmt(): Stmt = {
      p += 1 // 'def'
      val name = bump() match {
        case TName(nm) => nm
        case other => throw new ParseError(s"bad def name: $other")
      }
      expectOp("(")
      val params = Seq.newBuilder[String]
      val ptypes = Seq.newBuilder[Option[String]]
      var first = true
      while (cur != TOp(")")) {
        if (!first) expectOp(",")
        first = false
        if (cur != TOp(")")) {
          bump() match {
            case TName(pn) =>
              params += pn
              // type annotation: keep its dotted-name form for arg coercion
              if (cur == TOp(":")) {
                p += 1
                def nameOf(e: Expr): Option[String] = e match {
                  case NameE(n) => Some(n)
                  case AttrE(b, n) => nameOf(b).map(_ + "." + n)
                  case _ => None
                }
                ptypes += nameOf(expr())
              } else ptypes += None
            case other => throw new ParseError(s"bad param: $other")
          }
        }
      }
      expectOp(")")
      expectOp(":")
      val defIndent = lineIndent
      eatNewline()
      if (lineIndent <= defIndent)
        throw new ParseError(s"def $name: empty body")
      DefS(name, params.result(), ptypes.result(), stmtList(lineIndent))
    }

    def stmt(): Stmt = cur match {
      case TName("import") =>
        p += 1
        val m = bump() match {
          case TName(nm) => nm
          case other => throw new ParseError(s"bad import: $other")
        }
        ImportS(m)
      case TName("def") => defStmt()
      case TName("return") => p += 1; ReturnS(expr())
      case _ =>
        val e = expr()
        cur match {
          case TOp("=") => p += 1; Assign(e, expr())
          case _ => ExprStmt(e)
        }
    }

    /** Statements at indent >= minIndent; stops (without consuming) at
      * the first line that dedents below it.
      */
    def stmtList(minIndent: Int): Seq[Stmt] = {
      val out = Seq.newBuilder[Stmt]
      var going = true
      while (going && cur != TEof) {
        cur match {
          case TNewline(ni) => lineIndent = ni; p += 1 // blank line run
          case _ if lineIndent < minIndent => going = false
          case _ =>
            val s = stmt()
            out += s
            // defStmt already consumed through its body's trailing newline
            if (!s.isInstanceOf[DefS]) eatNewline()
        }
      }
      out.result()
    }

    stmtList(0)
  }
}

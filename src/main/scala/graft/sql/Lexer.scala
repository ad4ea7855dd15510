package graft.sql

/** Hand-written lexer for the StreamSQL dialect (reference: rsql/lexer.go —
  * same token classes: identifiers, backtick-quoted identifiers, single-quoted
  * strings, numbers, operators/punct; keywords are classified in the parser
  * because window-type names like `TumblingWindow` lex as plain identifiers).
  */
object Lexer {
  sealed trait Kind
  case object IdentTok extends Kind   // possibly backtick-quoted
  case object StringTok extends Kind
  case object NumberTok extends Kind
  case object PunctTok extends Kind   // operators and punctuation
  case object EofTok extends Kind

  final case class Token(kind: Kind, text: String, pos: Int) {
    def is(p: String): Boolean = kind == PunctTok && text == p
    /** case-insensitive keyword check against an identifier token */
    def isKw(kw: String): Boolean = kind == IdentTok && text.equalsIgnoreCase(kw)
    def upper: String = text.toUpperCase
  }

  private val multiCharOps = List("==", "!=", "<>", "<=", ">=", "&&", "||", "{-", "-}")
  private val singleCharOps = "()[]{},.+-*/%=<>!|?"

  def tokenize(sql: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql(i)
      if (c.isWhitespace) { i += 1 }
      else if (c == '-' && i + 1 < n && sql(i + 1) == '-') {
        // line comment
        while (i < n && sql(i) != '\n') i += 1
      } else if (c == '\'') {
        // single-quoted string; '' escapes a quote
        val sb = new StringBuilder
        val start = i
        i += 1
        var done = false
        while (!done) {
          if (i >= n) throw new ParseException(s"unterminated string at $start")
          val ch = sql(i)
          if (ch == '\'') {
            if (i + 1 < n && sql(i + 1) == '\'') { sb.append('\''); i += 2 }
            else { done = true; i += 1 }
          } else { sb.append(ch); i += 1 }
        }
        out += Token(StringTok, sb.toString, start)
      } else if (c == '"') {
        // double-quoted string (reference accepts both quote styles for
        // map keys, docs/NESTED_FIELD_ACCESS.md); "" escapes a quote
        val sb = new StringBuilder
        val start = i
        i += 1
        var done = false
        while (!done) {
          if (i >= n) throw new ParseException(s"unterminated string at $start")
          val ch = sql(i)
          if (ch == '"') {
            if (i + 1 < n && sql(i + 1) == '"') { sb.append('"'); i += 2 }
            else { done = true; i += 1 }
          } else { sb.append(ch); i += 1 }
        }
        out += Token(StringTok, sb.toString, start)
      } else if (c == '`') {
        val start = i
        i += 1
        val sb = new StringBuilder
        while (i < n && sql(i) != '`') { sb.append(sql(i)); i += 1 }
        if (i >= n) throw new ParseException(s"unterminated backtick identifier at $start")
        i += 1
        out += Token(IdentTok, sb.toString, start)
      } else if (c.isDigit || (c == '.' && i + 1 < n && sql(i + 1).isDigit)) {
        val start = i
        while (i < n && (sql(i).isDigit || sql(i) == '.')) i += 1
        // exponent
        if (i < n && (sql(i) == 'e' || sql(i) == 'E')) {
          val save = i
          i += 1
          if (i < n && (sql(i) == '+' || sql(i) == '-')) i += 1
          if (i < n && sql(i).isDigit) { while (i < n && sql(i).isDigit) i += 1 }
          else i = save
        }
        out += Token(NumberTok, sql.substring(start, i), start)
      } else if (c.isLetter || c == '_' || c == '$') {
        val start = i
        while (i < n && (sql(i).isLetterOrDigit || sql(i) == '_' || sql(i) == '$')) i += 1
        out += Token(IdentTok, sql.substring(start, i), start)
      } else {
        val two = if (i + 1 < n) sql.substring(i, i + 2) else ""
        multiCharOps.find(_ == two) match {
          case Some(op) => out += Token(PunctTok, op, i); i += 2
          case None =>
            if (singleCharOps.indexOf(c) >= 0) { out += Token(PunctTok, c.toString, i); i += 1 }
            else throw new ParseException(s"unexpected character '$c' at $i")
        }
      }
    }
    out += Token(EofTok, "", n)
    out.result()
  }
}

class ParseException(msg: String) extends RuntimeException(msg)

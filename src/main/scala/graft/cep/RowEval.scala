package graft.cep

import graft.sql._

/** Row-level interpreter for dialect expressions inside the CEP operator.
  *
  * The engine's normal path lowers expressions to Catalyst columns; inside
  * MATCH_RECOGNIZE, DEFINE predicates and MEASURES run per-row on the JVM
  * against matched-row bindings (the reference evaluates these with its own
  * interpreter + placeholder rewriting, reference: cep/eval.go:155-272).
  * Scope here: literals, field refs, symbol-qualified refs, arithmetic,
  * comparison, logic, CASE, IS NULL, navigation (PREV/NEXT/FIRST/LAST),
  * CLASSIFIER(), MATCH_NUMBER(), and SUM/AVG/COUNT/MIN/MAX over pattern
  * variables (reference: cep/eval.go:131-137).
  */
object RowEval {

  /** Evaluation context for one (partial or complete) match.
    *
    * @param rows       the partition's ordered rows
    * @param assignment matched (rowIndex, symbol) pairs in order
    * @param matchNumber 1-based per-partition match counter
    * @param currentIdx index into `assignment` for RUNNING (ALL ROWS) eval;
    *                   None = FINAL semantics
    * @param subsets    SUBSET name → member symbols
    */
  final case class Ctx(
      rows: IndexedSeq[Map[String, Any]],
      assignment: IndexedSeq[(Int, String)],
      matchNumber: Long,
      currentIdx: Option[Int],
      subsets: Map[String, List[String]],
      symbols: Set[String]) {

    def visible: IndexedSeq[(Int, String)] = currentIdx match {
      case Some(i) => assignment.take(i + 1)
      case None    => assignment
    }

    def currentRow: Map[String, Any] = currentIdx match {
      case Some(i) => rows(assignment(i)._1)
      case None    => if (assignment.isEmpty) Map.empty else rows(assignment.last._1)
    }

    def currentRowIdx: Int = currentIdx match {
      case Some(i) => assignment(i)._1
      case None    => if (assignment.isEmpty) -1 else assignment.last._1
    }

    def symbolMembers(name: String): Set[String] =
      subsets.get(name).map(_.toSet).getOrElse(Set(name))

    def rowsOf(sym: String): IndexedSeq[Map[String, Any]] = {
      val members = symbolMembers(sym)
      visible.collect { case (ri, s) if members.contains(s) => rows(ri) }
    }
  }

  // --------------------------------------------- row-local DEFINE fast path

  /** Functions whose evaluation navigates the match (not row-local). */
  private val navFns = Set("prev", "next", "first", "last", "count", "sum",
    "avg", "min", "max", "classifier", "match_number", "running", "final")

  /** A DEFINE condition that references only the row under test — rewritten
    * so `SYM.col` (the tested symbol) becomes plain `col` — or None when it
    * navigates (PREV/NEXT/FIRST/LAST), aggregates over pattern variables,
    * or reads another symbol's bindings. Row-local conditions are the
    * common case (`A AS value > 50`) and evaluate without building a match
    * context per probe — the hot-loop cost of dense batch CEP. */
  def rowLocalAst(e: SqlExpr, sym: String, symbols: Set[String],
      subsets: Map[String, List[String]]): Option[SqlExpr] = {
    val qualifiers = symbols ++ subsets.keySet
    def rw(x: SqlExpr): Option[SqlExpr] = x match {
      case NumberLit(_) | StringLit(_) | BoolLit(_) | NullLit | Star => Some(x)
      case Ident(segs) =>
        if (segs.size >= 2 && qualifiers.contains(segs.head.name) &&
            segs.head.indexes.isEmpty) {
          if (segs.head.name == sym) Some(Ident(segs.tail)) else None
        } else Some(x)
      case fc: FuncCall =>
        if (navFns.contains(fc.lname) || fc.over.isDefined) None
        else traverseOpt(fc.args)(rw).map(as => fc.copy(args = as))
      case BinOp(op, l, r) =>
        for (l2 <- rw(l); r2 <- rw(r)) yield BinOp(op, l2, r2)
      case UnaryOp(op, c) => rw(c).map(UnaryOp(op, _))
      case CaseWhen(operand, branches, otherwise) =>
        for {
          op2 <- operand.map(rw).map(_.map(Some(_))).getOrElse(Some(None))
          bs2 <- traverseOpt(branches)(b =>
            for (c2 <- rw(b._1); v2 <- rw(b._2)) yield (c2, v2))
          ow2 <- otherwise.map(rw).map(_.map(Some(_))).getOrElse(Some(None))
        } yield CaseWhen(op2, bs2, ow2)
      case IsNullExpr(c, n) => rw(c).map(IsNullExpr(_, n))
      case LikeExpr(c, p, n) =>
        for (c2 <- rw(c); p2 <- rw(p)) yield LikeExpr(c2, p2, n)
      case InExpr(c, items, n) =>
        for (c2 <- rw(c); is2 <- traverseOpt(items)(rw)) yield InExpr(c2, is2, n)
      case BetweenExpr(c, lo, hi, n) =>
        for (c2 <- rw(c); l2 <- rw(lo); h2 <- rw(hi))
          yield BetweenExpr(c2, l2, h2, n)
      case _ => None
    }
    rw(e)
  }

  private def traverseOpt[A, B](xs: List[A])(f: A => Option[B]): Option[List[B]] =
    xs.foldRight(Option(List.empty[B])) { (a, acc) =>
      for (b <- f(a); t <- acc) yield b :: t
    }

  private final class OneRowView extends IndexedSeq[Map[String, Any]]
      with Serializable {
    var row: Map[String, Any] = _
    def length: Int = 1
    def apply(i: Int): Map[String, Any] = row
  }

  /** Reusable zero-allocation evaluator for a row-local DEFINE condition.
    * NOT thread-safe — Spark deserializes one instance per task, which is
    * exactly that isolation. */
  final class RowLocalTest(e: SqlExpr, sym: String,
      subsets: Map[String, List[String]], symbols: Set[String])
      extends Serializable {
    private val view = new OneRowView
    private val ctx = Ctx(view, IndexedSeq((0, sym)), 0L, Some(0), subsets, symbols)
    def test(row: Map[String, Any]): Boolean = {
      view.row = row
      truthy(eval(e, ctx))
    }
  }

  def eval(e: SqlExpr, ctx: Ctx): Any = e match {
    case NumberLit(t) => if (!t.exists(c => c == '.' || c == 'e' || c == 'E')) t.toLong else t.toDouble
    case StringLit(s) => s
    case BoolLit(b)   => b
    case NullLit      => null
    case Star         => null

    case Ident(segs) =>
      // sym.col → last value of that symbol's rows (RUNNING/FINAL per ctx);
      // plain col → current row
      if (segs.size >= 2 && ctx.symbols.union(ctx.subsets.keySet).contains(segs.head.name)) {
        val rs = ctx.rowsOf(segs.head.name)
        if (rs.isEmpty) null else fieldOf(rs.last, segs.tail)
      } else fieldOf(ctx.currentRow, segs)

    case fc: FuncCall => evalFunc(fc, ctx)

    case BinOp(op, l, r) => op match {
      case "and" =>
        val lv = truthy(eval(l, ctx)); if (!lv) false else truthy(eval(r, ctx))
      case "or" =>
        val lv = truthy(eval(l, ctx)); if (lv) true else truthy(eval(r, ctx))
      case _ =>
        // `x = null` / `x != nil` are null TESTS (reference Go-nil
        // comparison, test/e2e/null_test.go:696-707)
        if ((op == "=" || op == "!=") && (l == NullLit || r == NullLit)) {
          val v = eval(if (l == NullLit) r else l, ctx)
          return if (op == "=") v == null else v != null
        }
        val (lv, rv) = (eval(l, ctx), eval(r, ctx))
        if (lv == null || rv == null) {
          op match {
            case "=" | "!=" | "<" | "<=" | ">" | ">=" => null
            case _ => null
          }
        } else op match {
          case "+" => arith(lv, rv, _ + _)
          case "-" => arith(lv, rv, _ - _)
          case "*" => arith(lv, rv, _ * _)
          case "/" => arith(lv, rv, _ / _)
          case "%" => arith(lv, rv, _ % _)
          case "=" => compare(lv, rv) == 0
          case "!=" => compare(lv, rv) != 0
          case "<" => compare(lv, rv) < 0
          case "<=" => compare(lv, rv) <= 0
          case ">" => compare(lv, rv) > 0
          case ">=" => compare(lv, rv) >= 0
        }
    }

    case UnaryOp("-", c) => eval(c, ctx) match {
      case null => null
      case v    => arith(0L, v, _ - _)
    }
    case UnaryOp("not", c) => eval(c, ctx) match {
      case null       => null
      case b: Boolean => !b
      case v          => !truthy(v)
    }
    case UnaryOp(_, _) => null

    case CaseWhen(operand, branches, otherwise) =>
      val matched = operand match {
        case Some(op) =>
          val ov = eval(op, ctx)
          branches.find(b => { val bv = eval(b._1, ctx); bv != null && ov != null && compare(ov, bv) == 0 })
        case None => branches.find(b => truthy(eval(b._1, ctx)))
      }
      matched.map(b => eval(b._2, ctx)).orElse(otherwise.map(eval(_, ctx))).orNull

    case IsNullExpr(c, negated) =>
      val v = eval(c, ctx); if (negated) v != null else v == null

    case LikeExpr(c, p, negated) =>
      (eval(c, ctx), eval(p, ctx)) match {
        case (s: String, pat: String) =>
          val rx = java.util.regex.Pattern.quote(pat)
            .replace("%", "\\E.*\\Q").replace("_", "\\E.\\Q")
          val m = s.matches(rx)
          if (negated) !m else m
        case _ => null
      }

    case InExpr(c, items, negated) =>
      val v = eval(c, ctx)
      if (v == null) null
      else {
        val in = items.exists(i => { val iv = eval(i, ctx); iv != null && compare(v, iv) == 0 })
        if (negated) !in else in
      }

    case BetweenExpr(c, lo, hi, negated) =>
      (eval(c, ctx), eval(lo, ctx), eval(hi, ctx)) match {
        case (v, l, h) if v != null && l != null && h != null =>
          val in = compare(v, l) >= 0 && compare(v, h) <= 0
          if (negated) !in else in
        case _ => null
      }
  }

  private def evalFunc(fc: FuncCall, ctx: Ctx): Any = fc.lname match {
    // RUNNING/FINAL markers from the measures parser: RUNNING keeps the
    // per-row prefix visibility (the ALL ROWS default); FINAL sees the
    // whole match from every row (one-row mode is FINAL already)
    case "running" => eval(fc.args.head, ctx)
    case "final"   => eval(fc.args.head, ctx.copy(currentIdx = None))
    case "match_number" => ctx.matchNumber
    case "classifier" => ctx.currentIdx match {
      case Some(i) => ctx.assignment(i)._2
      case None    => if (ctx.assignment.isEmpty) null else ctx.assignment.last._2
    }
    case "first" | "last" =>
      val target = fc.args.head
      target match {
        case Ident(segs) if segs.size >= 2 =>
          val rs = ctx.rowsOf(segs.head.name)
          if (rs.isEmpty) null
          else fieldOf(if (fc.lname == "first") rs.head else rs.last, segs.tail)
        case other =>
          val rs = ctx.visible
          if (rs.isEmpty) null
          else eval(other,
            ctx.copy(currentIdx = Some(if (fc.lname == "first") 0 else rs.size - 1)))
      }
    case "prev" | "next" =>
      val off = fc.args.lift(1).map(a => eval(a, ctx) match {
        case n: Number => n.intValue(); case _ => 1
      }).getOrElse(1)
      val delta = if (fc.lname == "prev") -off else off
      val idx = ctx.currentRowIdx + delta
      if (idx < 0 || idx >= ctx.rows.length) null
      else fc.args.head match {
        case Ident(segs) =>
          val path = if (segs.size >= 2 &&
            ctx.symbols.union(ctx.subsets.keySet).contains(segs.head.name)) segs.tail else segs
          fieldOf(ctx.rows(idx), path)
        case other => null
      }
    case "sum" | "avg" | "count" | "min" | "max" =>
      val vals: Seq[Any] = fc.args.head match {
        case Star => ctx.visible.map(_ => 1L)
        case Ident(segs) if segs.size >= 2 &&
            ctx.symbols.union(ctx.subsets.keySet).contains(segs.head.name) =>
          ctx.rowsOf(segs.head.name).map(r => fieldOf(r, segs.tail)).filter(_ != null)
        case Ident(segs) =>
          ctx.visible.map(a => fieldOf(ctx.rows(a._1), segs)).filter(_ != null)
        case other =>
          ctx.visible.indices.map(i => eval(other, ctx.copy(currentIdx = Some(i))))
            .filter(_ != null)
      }
      fc.lname match {
        case "count" => vals.size.toLong
        case "sum"   => if (vals.isEmpty) null else vals.map(toDouble).sum
        case "avg"   => if (vals.isEmpty) null else vals.map(toDouble).sum / vals.size
        case "min"   => if (vals.isEmpty) null else vals.minBy(toDouble)
        case "max"   => if (vals.isEmpty) null else vals.maxBy(toDouble)
      }
    case "abs" => num1(fc, ctx)(math.abs)
    case "coalesce" =>
      fc.args.iterator.map(eval(_, ctx)).find(_ != null).orNull
    case "upper" => str1(fc, ctx)(_.toUpperCase)
    case "lower" => str1(fc, ctx)(_.toLowerCase)

    // ---- math (same lowering as FunctionMap: ln natural, log base-10) ----
    case "sqrt"  => num1(fc, ctx)(math.sqrt)
    case "exp"   => num1(fc, ctx)(math.exp)
    case "ln"    => num1(fc, ctx)(math.log)
    case "log" | "log10" => num1(fc, ctx)(math.log10)
    case "log2"  => num1(fc, ctx)(x => math.log(x) / math.log(2))
    case "sign"  => num1(fc, ctx)(math.signum)
    case "floor" => eval(fc.args.head, ctx) match {
      case null => null; case v => math.floor(toDouble(v)).toLong
    }
    case "ceil" | "ceiling" => eval(fc.args.head, ctx) match {
      case null => null; case v => math.ceil(toDouble(v)).toLong
    }
    case "round" =>
      val d = fc.args.lift(1).map(a => toDouble(eval(a, ctx)).toInt).getOrElse(0)
      eval(fc.args.head, ctx) match {
        case null => null
        case v =>
          BigDecimal(toDouble(v)).setScale(d, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    case "power" | "pow" => num2(fc, ctx)(math.pow)
    case "mod" => num2(fc, ctx)((a, b) => a % b)
    case "least" =>
      val vs = fc.args.map(eval(_, ctx))
      if (vs.exists(_ == null)) null else vs.minBy(toDouble)
    case "greatest" =>
      val vs = fc.args.map(eval(_, ctx))
      if (vs.exists(_ == null)) null else vs.maxBy(toDouble)

    // ---- string (dialect semantics: 0-based indexof/substring) ----
    case "length" => str1(fc, ctx)(s => s.length.toLong)
    case "trim"   => str1(fc, ctx)(_.trim)
    case "ltrim"  => str1(fc, ctx)(_.replaceAll("^\\s+", ""))
    case "rtrim"  => str1(fc, ctx)(_.replaceAll("\\s+$", ""))
    case "concat" =>
      val vs = fc.args.map(eval(_, ctx))
      if (vs.exists(_ == null)) null else vs.map(_.toString).mkString
    case "replace" =>
      (eval(fc.args.head, ctx), eval(fc.args(1), ctx), eval(fc.args(2), ctx)) match {
        case (s: String, f: String, t: String) => s.replace(f, t)
        case _ => null
      }
    case "indexof" => // 0-based Go strings.Index (functions_string.go:271-289)
      (eval(fc.args.head, ctx), eval(fc.args(1), ctx)) match {
        case (s: String, sub: String) => s.indexOf(sub).toLong
        case _ => null
      }
    case "substring" => // 0-based; negative start from end (functions_string.go:291-315)
      eval(fc.args.head, ctx) match {
        case s: String =>
          val start = toDouble(eval(fc.args(1), ctx)).toInt
          val from = if (start < 0) math.max(s.length + start, 0) else math.min(start, s.length)
          val until = fc.args.lift(2)
            .map(a => math.min(from + toDouble(eval(a, ctx)).toInt, s.length))
            .getOrElse(s.length)
          if (until <= from) "" else s.substring(from, until)
        case _ => null
      }
    case "startswith" =>
      (eval(fc.args.head, ctx), eval(fc.args(1), ctx)) match {
        case (s: String, p: String) => s.startsWith(p); case _ => null
      }
    case "endswith" =>
      (eval(fc.args.head, ctx), eval(fc.args(1), ctx)) match {
        case (s: String, p: String) => s.endsWith(p); case _ => null
      }

    // ---- conditional / type predicates ----
    case "if_null" | "ifnull" =>
      eval(fc.args.head, ctx) match {
        case null => eval(fc.args(1), ctx); case v => v
      }
    case "null_if" | "nullif" =>
      val (a, b) = (eval(fc.args.head, ctx), eval(fc.args(1), ctx))
      if (a != null && b != null && compare(a, b) == 0) null else a
    case "is_null"     => eval(fc.args.head, ctx) == null
    case "is_not_null" => eval(fc.args.head, ctx) != null
    case "is_numeric"  => eval(fc.args.head, ctx) match {
      case null => false
      case n: Number => true
      case s: String => !toDouble(s).isNaN
      case _ => false
    }
    case "cast" =>
      val v = eval(fc.args.head, ctx)
      val tpe = fc.args(1) match { case StringLit(t) => t.toLowerCase; case _ => "string" }
      if (v == null) null else tpe match {
        case "int" | "int32" | "bigint" | "int64" | "long" => v match {
          // integral inputs pass through exactly — no double round-trip
          // (values above 2^53 would silently lose precision)
          case n @ (_: java.lang.Long | _: java.lang.Integer |
                    _: java.lang.Short | _: java.lang.Byte) =>
            n.asInstanceOf[Number].longValue()
          case s: String =>
            try java.lang.Long.parseLong(s.trim)
            catch { case _: NumberFormatException =>
              val d = toDouble(s); if (d.isNaN) null else d.toLong }
          case other =>
            val d = toDouble(other); if (d.isNaN) null else d.toLong
        }
        case "float" | "float64" | "double"                => toDouble(v)
        case "bool" | "boolean"                            => truthy(v)
        case _                                             => v.toString
      }

    case other =>
      throw new IllegalArgumentException(s"unsupported function in MATCH_RECOGNIZE: $other")
  }

  private def num1(fc: FuncCall, ctx: Ctx)(f: Double => Double): Any =
    eval(fc.args.head, ctx) match { case null => null; case v => f(toDouble(v)) }

  private def num2(fc: FuncCall, ctx: Ctx)(f: (Double, Double) => Double): Any =
    (eval(fc.args.head, ctx), eval(fc.args(1), ctx)) match {
      case (null, _) | (_, null) => null
      case (a, b) => f(toDouble(a), toDouble(b))
    }

  private def str1(fc: FuncCall, ctx: Ctx)(f: String => Any): Any =
    eval(fc.args.head, ctx) match { case s: String => f(s); case _ => null }

  // ------------------------------------------------------------- helpers

  private def fieldOf(row: Map[String, Any], segs: List[Ident.Seg]): Any = {
    var cur: Any = row
    segs.foreach { s =>
      cur = cur match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].getOrElse(s.name, null)
        case r: org.apache.spark.sql.Row =>
          try r.getAs[Any](s.name) catch { case _: Throwable => null }
        case _ => null
      }
      s.indexes.foreach { idx =>
        cur = (cur, idx) match {
          case (seq: Seq[_], graft.sql.Ident.IntIdx(i)) =>
            val j = if (i < 0) seq.size + i else i
            if (j >= 0 && j < seq.size) seq(j) else null
          case (arr: Array[_], graft.sql.Ident.IntIdx(i)) =>
            val j = if (i < 0) arr.length + i else i
            if (j >= 0 && j < arr.length) arr(j) else null
          case (m: Map[_, _], graft.sql.Ident.KeyIdx(k)) =>
            m.asInstanceOf[Map[String, Any]].getOrElse(k, null)
          case _ => null
        }
      }
    }
    cur
  }

  def toDouble(v: Any): Double = v match {
    case n: Number => n.doubleValue()
    case b: Boolean => if (b) 1.0 else 0.0
    case t: java.sql.Timestamp => t.getTime.toDouble
    case i: java.time.Instant => i.toEpochMilli.toDouble
    case s: String => try s.toDouble catch { case _: Throwable => Double.NaN }
    case null => Double.NaN
    case _ => Double.NaN
  }

  def toMillis(v: Any): Long = v match {
    case n: Number => n.longValue()
    case t: java.sql.Timestamp => t.getTime
    case i: java.time.Instant => i.toEpochMilli
    case d: java.sql.Date => d.getTime
    case _ => 0L
  }

  def truthy(v: Any): Boolean = v match {
    case null => false
    case b: Boolean => b
    case n: Number => n.doubleValue() != 0
    case s: String => s.nonEmpty
    case _ => true
  }

  def compare(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String) => x.compareTo(y)
    case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y)
    case (x: Boolean, y: Boolean) => x.compareTo(y)
    case _ => java.lang.Double.compare(toDouble(a), toDouble(b))
  }

  private def arith(l: Any, r: Any, f: (Double, Double) => Double): Any = {
    val res = f(toDouble(l), toDouble(r))
    (l, r) match {
      // integral op integral stays integral when exact (ts arithmetic etc.)
      case (_: Long, _: Long) | (_: Int, _: Long) | (_: Long, _: Int) | (_: Int, _: Int)
        if res == math.floor(res) && !res.isInfinite => res.toLong
      case _ => res
    }
  }
}

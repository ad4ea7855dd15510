package graft.sql

/** Typed AST for the StreamSQL dialect.
  *
  * Grammar semantics derived from the reference parser
  * (reference: rsql/parser.go:149-248 clause order; rsql/ast.go:19-54 IR), but —
  * unlike the reference, which keeps SELECT expressions as raw strings — this is
  * a fully typed expression tree that lowers directly to Spark `Column`s.
  */
sealed trait SqlExpr

object SqlExpr {
  /** Top-down rewrite: where `f` is defined, the node is REPLACED and not
    * descended into (return the node unchanged to stop descent there);
    * elsewhere children rewrite recursively. Single traversal skeleton for
    * all plan-builder rewrites — new AST nodes only need a case here. */
  def transformDown(e: SqlExpr)(f: PartialFunction[SqlExpr, SqlExpr]): SqlExpr = {
    def go(e: SqlExpr): SqlExpr =
      if (f.isDefinedAt(e)) f(e)
      else e match {
        case fc: FuncCall    => fc.copy(args = fc.args.map(go))
        case BinOp(op, l, r) => BinOp(op, go(l), go(r))
        case UnaryOp(op, c)  => UnaryOp(op, go(c))
        case CaseWhen(op, br, el) =>
          CaseWhen(op.map(go), br.map(b => (go(b._1), go(b._2))), el.map(go))
        case IsNullExpr(c, n)  => IsNullExpr(go(c), n)
        case LikeExpr(c, p, n) => LikeExpr(go(c), p, n)
        case InExpr(c, items, n) => InExpr(go(c), items.map(go), n)
        case BetweenExpr(c, lo, hi, n) => BetweenExpr(go(c), go(lo), go(hi), n)
        case other => other
      }
    go(e)
  }
}

/** Dotted field path with optional array/map subscripts, e.g.
  * `device.info.name`, `sensors[0].value`, `readings[-1]` (negative =
  * from the end), `config['host']` (map key), `matrix[2][1]`, `m.location`
  * (join-alias qualified). Each segment is (name, Seq(subscripts)).
  * (reference: utils/fieldpath; docs/NESTED_FIELD_ACCESS.md) */
final case class Ident(segments: List[Ident.Seg]) extends SqlExpr {
  def raw: String = segments
    .map(s => s.name + s.indexes.map {
      case Ident.IntIdx(i) => s"[$i]"
      case Ident.KeyIdx(k) => s"['$k']"
    }.mkString)
    .mkString(".")
  def head: String = segments.head.name
}
object Ident {
  sealed trait Idx
  final case class IntIdx(i: Int) extends Idx
  final case class KeyIdx(key: String) extends Idx
  final case class Seg(name: String, indexes: List[Idx] = Nil)
  def simple(name: String): Ident = Ident(List(Seg(name)))
}

final case class NumberLit(text: String) extends SqlExpr {
  def isIntegral: Boolean = !text.exists(c => c == '.' || c == 'e' || c == 'E')
  def toLong: Long = text.toLong
  def toDouble: Double = text.toDouble
}
final case class StringLit(value: String) extends SqlExpr
final case class BoolLit(value: Boolean) extends SqlExpr
case object NullLit extends SqlExpr
case object Star extends SqlExpr

/** Function call; `over` present for analytic calls (reference: rsql/parser.go:667-756 —
  * only PARTITION BY + WHEN are legal inside OVER in the reference; we additionally
  * accept ORDER BY as a Spark-first extension). */
final case class FuncCall(
    name: String,
    args: List[SqlExpr],
    over: Option[OverClause] = None,
    distinct: Boolean = false
) extends SqlExpr {
  def lname: String = name.toLowerCase
}

final case class OverClause(
    partitionBy: List[SqlExpr],
    orderBy: List[OrderItem] = Nil,
    when: Option[SqlExpr] = None
)

final case class BinOp(op: String, l: SqlExpr, r: SqlExpr) extends SqlExpr
final case class UnaryOp(op: String, e: SqlExpr) extends SqlExpr
final case class CaseWhen(
    operand: Option[SqlExpr],
    branches: List[(SqlExpr, SqlExpr)],
    otherwise: Option[SqlExpr]
) extends SqlExpr
final case class IsNullExpr(e: SqlExpr, negated: Boolean) extends SqlExpr
final case class LikeExpr(e: SqlExpr, pattern: SqlExpr, negated: Boolean) extends SqlExpr
final case class InExpr(e: SqlExpr, items: List[SqlExpr], negated: Boolean) extends SqlExpr
final case class BetweenExpr(e: SqlExpr, lo: SqlExpr, hi: SqlExpr, negated: Boolean)
    extends SqlExpr

final case class SelectItem(expr: SqlExpr, alias: Option[String]) {
  /** Output column name: alias, else simple-path last segment, else raw text slot. */
  def outputName: String = alias.getOrElse(expr match {
    case id: Ident => id.segments.last.name
    case FuncCall(n, _, _, _) => n.toLowerCase
    case _ => "expr"
  })
}

final case class OrderItem(expr: SqlExpr, asc: Boolean = true)

/** Window specs attach to GROUP BY (reference: window/factory.go:51-66).
  * Durations are millis. */
sealed trait WindowSpec
final case class TumblingWindow(sizeMs: Long) extends WindowSpec
final case class SlidingWindow(sizeMs: Long, slideMs: Long) extends WindowSpec
final case class SessionWindow(gapMs: Long) extends WindowSpec
/** CountingWindow(n) [OVER (WHEN cond)] — fires every n rows per group key
  * (reference: window/counting_window.go). */
final case class CountingWindow(count: Int, when: Option[SqlExpr] = None) extends WindowSpec
/** GLOBAL WINDOW [TRIGGER WHEN pred] (reference: window/global_window.go). */
final case class GlobalWindow(triggerWhen: Option[SqlExpr]) extends WindowSpec

final case class JoinClause(
    joinType: String, // "inner" | "left_outer"
    table: String,
    alias: Option[String],
    on: SqlExpr
)

// ---------------- MATCH_RECOGNIZE (reference: types/match_recognize.go:44-107) ----
sealed trait PatternNode
object Pattern {
  final case class Sym(name: String) extends PatternNode
  final case class Seq(parts: List[PatternNode]) extends PatternNode
  final case class Alt(parts: List[PatternNode]) extends PatternNode
  /** min..max (max = -1 → unbounded); greedy vs reluctant. */
  final case class Quant(child: PatternNode, min: Int, max: Int, greedy: Boolean)
      extends PatternNode
  final case class Permute(parts: List[PatternNode]) extends PatternNode
}

final case class MatchRecognize(
    partitionBy: List[SqlExpr],
    orderBy: List[OrderItem],
    measures: List[SelectItem],
    allRows: Boolean, // false = ONE ROW PER MATCH
    afterMatch: AfterMatch,
    pattern: Option[PatternNode],
    subsets: Map[String, List[String]],
    defines: Map[String, SqlExpr],
    withinMs: Long // mandatory bound; reference default 1h
)

sealed trait AfterMatch
object AfterMatch {
  case object PastLastRow extends AfterMatch
  case object ToNextRow extends AfterMatch
  final case class ToFirst(sym: String) extends AfterMatch
  final case class ToLast(sym: String) extends AfterMatch
}

/** Whole-query IR (reference: rsql/ast.go:19-54 SelectStatement). */
/** Top-level statement: a query optionally composed with further queries
  * via set operations (Spark-first surface extension, SURVEY §2.7 — the
  * reference only reserves the keywords). ORDER BY/LIMIT bind to each
  * SELECT, not the composite. */
final case class Statement(head: Query, ops: List[Statement.SetOpPart])
object Statement {
  final case class SetOpPart(op: String, all: Boolean, q: Query)
}

final case class Query(
    distinct: Boolean,
    items: List[SelectItem],
    from: String,
    fromAlias: Option[String],
    joins: List[JoinClause],
    matchRecognize: Option[MatchRecognize],
    where: Option[SqlExpr],
    groupBy: List[SqlExpr],
    window: Option[WindowSpec],
    having: Option[SqlExpr],
    options: Map[String, String], // WITH (k='v', ...) uppercased keys
    orderBy: List[OrderItem],
    limit: Option[Int],
    // "plain" | "rollup" | "cube" — GROUP BY ROLLUP/CUBE(...) is a
    // Spark-first surface extension (SURVEY §2.4: the reference has no
    // grouping sets; Catalyst provides them for free)
    groupStyle: String = "plain"
)

object Durations {
  /** Parse Go-style duration strings: '5s', '100ms', '1h30m', '1.5s', '2d'. */
  def toMillis(s: String): Long = {
    val str = s.trim
    require(str.nonEmpty, s"empty duration")
    var i = 0
    var total = 0.0
    while (i < str.length) {
      val start = i
      while (i < str.length && (str(i).isDigit || str(i) == '.')) i += 1
      require(i > start, s"bad duration '$s' at pos $start")
      val num = str.substring(start, i).toDouble
      val us = i
      while (i < str.length && str(i).isLetter) i += 1
      val unit = str.substring(us, i)
      val ms = unit match {
        case "ns"      => num / 1e6
        case "us" | "µs" => num / 1e3
        case "ms"      => num
        case "s" | ""  => num * 1000
        case "m"       => num * 60000
        case "h"       => num * 3600000
        case "d"       => num * 86400000
        case other     => throw new IllegalArgumentException(s"bad duration unit '$other' in '$s'")
      }
      total += ms
    }
    total.toLong
  }
}

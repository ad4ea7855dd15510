package graft.plan

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.sql._
import graft.functions.FunctionMap

/** Lowers a typed dialect expression tree to a Spark `Column`.
  *
  * Aggregate and analytic calls are delegated to the supplied callbacks so the
  * same builder serves the direct path (where they are illegal), the
  * aggregation path (slot extraction — the Spark-side equivalent of the
  * reference's `__placeholder__` rewriting, reference: aggregator/post_aggregation.go:60-200),
  * and post-aggregation expressions.
  */
object ExprBuilder {

  final case class Ctx(
      resolveIdent: Ident => Column,
      onAggregate: FuncCall => Column,
      onAnalytic: FuncCall => Column,
      starCols: () => List[Column] = () => throw new IllegalStateException("* not allowed here"),
      // struct of the source row's columns, for per-row dynamic expr();
      // None where runtime expressions are not supported (CEP, ORDER BY)
      rowStruct: Option[() => Column] = None
  )

  def isAggregateCall(e: SqlExpr): Boolean = e match {
    case fc: FuncCall => FunctionMap.isAggregate(fc.lname) && fc.over.isEmpty
    case _            => false
  }

  def isAnalyticCall(e: SqlExpr): Boolean = e match {
    case fc: FuncCall => FunctionMap.isAnalytic(fc.lname) || fc.over.isDefined
    case _            => false
  }

  /** Does this subtree contain an aggregate call (outside analytic args)? */
  def containsAggregate(e: SqlExpr): Boolean = e match {
    case fc: FuncCall if isAggregateCall(fc) => true
    case fc: FuncCall => fc.args.exists(containsAggregate)
    case BinOp(_, l, r) => containsAggregate(l) || containsAggregate(r)
    case UnaryOp(_, c) => containsAggregate(c)
    case CaseWhen(op, br, el) =>
      op.exists(containsAggregate) ||
        br.exists(b => containsAggregate(b._1) || containsAggregate(b._2)) ||
        el.exists(containsAggregate)
    case IsNullExpr(c, _) => containsAggregate(c)
    case LikeExpr(c, p, _) => containsAggregate(c) || containsAggregate(p)
    case InExpr(c, items, _) => containsAggregate(c) || items.exists(containsAggregate)
    case BetweenExpr(c, lo, hi, _) =>
      containsAggregate(c) || containsAggregate(lo) || containsAggregate(hi)
    case _ => false
  }

  def containsAnalytic(e: SqlExpr): Boolean = e match {
    case fc: FuncCall if isAnalyticCall(fc) => true
    case fc: FuncCall => fc.args.exists(containsAnalytic)
    case BinOp(_, l, r) => containsAnalytic(l) || containsAnalytic(r)
    case UnaryOp(_, c) => containsAnalytic(c)
    case CaseWhen(op, br, el) =>
      op.exists(containsAnalytic) ||
        br.exists(b => containsAnalytic(b._1) || containsAnalytic(b._2)) ||
        el.exists(containsAnalytic)
    case IsNullExpr(c, _) => containsAnalytic(c)
    case LikeExpr(c, p, _) => containsAnalytic(c) || containsAnalytic(p)
    case InExpr(c, items, _) => containsAnalytic(c) || items.exists(containsAnalytic)
    case BetweenExpr(c, lo, hi, _) =>
      containsAnalytic(c) || containsAnalytic(lo) || containsAnalytic(hi)
    case _ => false
  }

  /** Collect all aggregate calls in the subtree (not descending into them). */
  def collectAggregates(e: SqlExpr): List[FuncCall] = e match {
    case fc: FuncCall if isAggregateCall(fc) => List(fc)
    case fc: FuncCall => fc.args.flatMap(collectAggregates)
    case BinOp(_, l, r) => collectAggregates(l) ++ collectAggregates(r)
    case UnaryOp(_, c) => collectAggregates(c)
    case CaseWhen(op, br, el) =>
      op.toList.flatMap(collectAggregates) ++
        br.flatMap(b => collectAggregates(b._1) ++ collectAggregates(b._2)) ++
        el.toList.flatMap(collectAggregates)
    case IsNullExpr(c, _) => collectAggregates(c)
    case LikeExpr(c, p, _) => collectAggregates(c) ++ collectAggregates(p)
    case InExpr(c, items, _) => collectAggregates(c) ++ items.flatMap(collectAggregates)
    case BetweenExpr(c, lo, hi, _) =>
      collectAggregates(c) ++ collectAggregates(lo) ++ collectAggregates(hi)
    case _ => Nil
  }

  def collectAnalytics(e: SqlExpr): List[FuncCall] = e match {
    case fc: FuncCall if isAnalyticCall(fc) => List(fc)
    case fc: FuncCall => fc.args.flatMap(collectAnalytics)
    case BinOp(_, l, r) => collectAnalytics(l) ++ collectAnalytics(r)
    case UnaryOp(_, c) => collectAnalytics(c)
    case CaseWhen(op, br, el) =>
      op.toList.flatMap(collectAnalytics) ++
        br.flatMap(b => collectAnalytics(b._1) ++ collectAnalytics(b._2)) ++
        el.toList.flatMap(collectAnalytics)
    case IsNullExpr(c, _) => collectAnalytics(c)
    case LikeExpr(c, p, _) => collectAnalytics(c) ++ collectAnalytics(p)
    case InExpr(c, items, _) => collectAnalytics(c) ++ items.flatMap(collectAnalytics)
    case BetweenExpr(c, lo, hi, _) =>
      collectAnalytics(c) ++ collectAnalytics(lo) ++ collectAnalytics(hi)
    case _ => Nil
  }

  def build(e: SqlExpr, ctx: Ctx): Column = e match {
    case id: Ident       => ctx.resolveIdent(id)
    case n: NumberLit =>
      if (!n.isIntegral) lit(n.toDouble)
      else {
        // int-range literals lower as INT (widens implicitly; strict-INT
        // parameters like element_at's index reject BIGINT)
        val v = n.toLong
        if (v >= Int.MinValue && v <= Int.MaxValue) lit(v.toInt) else lit(v)
      }
    case StringLit(s)    => lit(s)
    case BoolLit(b)      => lit(b)
    case NullLit         => lit(null)
    case Star            => throw new IllegalArgumentException("bare * outside count(*)")

    case fc: FuncCall if isAnalyticCall(fc) => ctx.onAnalytic(fc)
    case fc: FuncCall if isAggregateCall(fc) => ctx.onAggregate(fc)
    case fc: FuncCall => buildScalarCall(fc, ctx)

    case BinOp(op, l, r) =>
      lazy val (lc, rc) = (build(l, ctx), build(r, ctx))
      op match {
        // `x = null` / `x != nil` are null TESTS in the reference (Go nil
        // comparison, test/e2e/null_test.go:696-707), not SQL three-valued
        // equality — lower to isNull/isNotNull
        case "=" if r == NullLit  => lc.isNull
        case "=" if l == NullLit  => rc.isNull
        case "!=" if r == NullLit => lc.isNotNull
        case "!=" if l == NullLit => rc.isNotNull
        case "="   => lc === rc
        case "!="  => lc =!= rc
        case "<"   => lc < rc
        case "<="  => lc <= rc
        case ">"   => lc > rc
        case ">="  => lc >= rc
        case "and" => lc && rc
        case "or"  => lc || rc
        case "+"   => lc + rc
        case "-"   => lc - rc
        case "*"   => lc * rc
        case "/"   => lc / rc
        case "%"   => lc % rc
        case other => throw new IllegalArgumentException(s"unknown operator $other")
      }

    case UnaryOp("-", c)   => -build(c, ctx)
    case UnaryOp("not", c) => !build(c, ctx)
    case UnaryOp(op, _)    => throw new IllegalArgumentException(s"unknown unary $op")

    case CaseWhen(operand, branches, otherwise) =>
      val toCond: SqlExpr => Column = operand match {
        case Some(op) => b => build(op, ctx) === build(b, ctx)
        case None     => b => build(b, ctx)
      }
      val first = when(toCond(branches.head._1), build(branches.head._2, ctx))
      val chained = branches.tail.foldLeft(first) { (acc, b) =>
        acc.when(toCond(b._1), build(b._2, ctx))
      }
      otherwise.map(o => chained.otherwise(build(o, ctx))).getOrElse(chained)

    case IsNullExpr(c, negated) =>
      if (negated) build(c, ctx).isNotNull else build(c, ctx).isNull

    case LikeExpr(c, pattern, negated) =>
      val base = pattern match {
        case StringLit(p) => build(c, ctx).like(p)
        case other        => call_function("like", build(c, ctx), build(other, ctx))
      }
      if (negated) !base else base

    case InExpr(c, items, negated) =>
      val base = build(c, ctx).isInCollection(items.map(build(_, ctx)))
      if (negated) !base else base

    case BetweenExpr(c, lo, hi, negated) =>
      val cc = build(c, ctx)
      val base = cc >= build(lo, ctx) && cc <= build(hi, ctx)
      if (negated) !base else base
  }

  /** Scalar call; literal-semantic functions inspect AST args here. */
  private def buildScalarCall(fc: FuncCall, ctx: Ctx): Column = {
    def arg(i: Int): Column = build(fc.args(i), ctx)
    def litStr(i: Int): String = fc.args(i) match {
      case StringLit(s) => s
      case Ident(List(Ident.Seg(n, Nil))) => n // unquoted unit/type tokens
      case other => throw new IllegalArgumentException(
        s"${fc.name}: argument ${i + 1} must be a literal, got $other")
    }
    def litInt(i: Int): Int = fc.args(i) match {
      case NumberLit(t) => t.toDouble.toInt
      case other => throw new IllegalArgumentException(
        s"${fc.name}: argument ${i + 1} must be an integer literal, got $other")
    }
    fc.lname match {
      case "expr" =>
        fc.args.head match {
          case StringLit(s) =>
            // plan-time literal (functions_expr.go:16): parse + inline —
            // fully typed, stays in codegen
            build(Parser.parseExpression(s), ctx)
          case _ =>
            // runtime string: per-row interpreted fallback, stringly typed
            ctx.rowStruct match {
              case Some(rs) => graft.functions.DynamicExpr.asString(arg(0), rs())
              case None => throw new ParseException(
                "expr() with a runtime argument is only supported in the " +
                  "SELECT/WHERE of a table query (use a string literal here)")
            }
        }
      case "cast"     => FunctionMap.castToLiteral(arg(0), litStr(1))
      case "encode"   => FunctionMap.encodeAsLiteral(arg(0), litStr(1))
      case "decode"   => FunctionMap.decodeAsLiteral(arg(0), litStr(1))
      case "date_add" => FunctionMap.dateAddLiteral(arg(0), arg(1), litStr(2))
      case "date_sub" => FunctionMap.dateAddLiteral(arg(0), -arg(1), litStr(2))
      case "date_diff" =>
        if (fc.args.size >= 3) FunctionMap.dateDiffLiteral(arg(0), arg(1), litStr(2))
        else FunctionMap.dateDiffLiteral(arg(0), arg(1), "second")
      case "extract" => FunctionMap.extractLiteral(litStr(0), arg(1))
      case "json_extract" => get_json_object(arg(0), litStr(1))
      // n-gram array of the normalized text (kernel, non-distinct, in
      // order) — n is plan-time structural (sets the kernel literal)
      case "word_ngrams" =>
        graft.functions.TextKernels.ngramsCol(
          graft.operators.TextOps.normalize(arg(0)), litInt(1))
      case "format" =>
        if (fc.args.size == 1) arg(0).cast("string")
        else FunctionMap.formatWithPattern(arg(0), litStr(1))
      case "coalesce" => coalesce(fc.args.map(build(_, ctx)): _*)
      case _ => FunctionMap.scalar(fc.name, fc.args.map(build(_, ctx)))
    }
  }
}

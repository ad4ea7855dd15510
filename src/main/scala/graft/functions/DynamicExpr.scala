package graft.functions

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions.udf
import graft.cep.RowEval
import graft.sql.{Parser, SqlExpr}

/** Per-row dynamic expression evaluation (reference: functions_expr.go:16).
  *
  * The reference evaluates an expression STRING produced at runtime — it can
  * differ row to row — which no static Catalyst plan can express. This is
  * the one scalar deliberately lowered to an interpreted fallback: the
  * string is parsed with the dialect parser (per-executor AST cache, so a
  * handful of distinct strings parse once) and evaluated by the CEP row
  * interpreter ([[RowEval]]) against the current row's columns. The result
  * is stringly typed — the expression, hence its type, varies per row
  * (documented delta, SURVEY §2.8). Plan-time `expr('literal')` keeps the
  * fully typed, codegen'd inlining and never reaches this path.
  */
object DynamicExpr extends Serializable {

  private val MaxCacheEntries = 1024
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, SqlExpr]()

  private def parsed(s: String): SqlExpr = {
    val hit = cache.get(s)
    if (hit != null) hit
    else {
      val ast = Parser.parseExpression(s)
      if (cache.size < MaxCacheEntries) cache.put(s, ast)
      ast
    }
  }

  /** Evaluate `exprStr` against one row; null string or eval-to-null → null. */
  def evalRow(exprStr: String, row: Row): String = {
    if (exprStr == null || row == null) return null
    val names = row.schema.fieldNames
    val m: Map[String, Any] =
      names.iterator.zipWithIndex.map { case (n, i) => n -> row.get(i) }.toMap
    val ctx = RowEval.Ctx(Vector(m), IndexedSeq((0, "")), 0L, Some(0),
      Map.empty, Set.empty)
    RowEval.eval(parsed(exprStr), ctx) match {
      case null => null
      case v    => v.toString
    }
  }

  /** Column form: expr-string column × struct of the row's base columns. */
  def asString(exprStr: Column, rowStruct: Column): Column =
    udf(evalRow _).apply(exprStr, rowStruct)
}

package graft.cep

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sql._
import graft.plan.{ExprBuilder, Resolver}

/** MATCH_RECOGNIZE execution (reference: cep/ package — SQL:2016, Flink-
  * aligned subset; SURVEY.md §2.10).
  *
  * Batch plan: WHERE-filter → key by PARTITION BY → `repartition(key)` →
  * `sortWithinPartitions(key, ORDER BY)` (Spark's spillable external sort)
  * → `mapPartitions` running the incremental matcher ([[CepIncremental]] →
  * [[Matcher]]) → MEASURES evaluation ([[RowEval]]) → outer SELECT.
  * Keys scale out across executors; within a key the heap holds only the
  * active WITHIN window, bounded further by the reference's maxRunRows
  * (cep/engine.go:17-22) — a skewed key spills in the sort instead of
  * materializing in one task's memory.
  */
object CepExec extends Serializable {

  def run(df0: DataFrame, q: Query, resolver: Resolver): DataFrame = {
    val mr = q.matchRecognize.get
    val spark = df0.sparkSession

    // enrich → WHERE → CEP (reference: stream/processor_data.go:113-141)
    val dctx = ExprBuilder.Ctx(
      resolveIdent = resolver.resolve,
      onAggregate = fc => throw new IllegalArgumentException(
        s"aggregate ${fc.name} not allowed with MATCH_RECOGNIZE"),
      onAnalytic = fc => throw new IllegalArgumentException(
        s"analytic ${fc.name} not allowed with MATCH_RECOGNIZE"))
    val df = q.where.map(w => df0.filter(ExprBuilder.build(w, dctx))).getOrElse(df0)

    val partNames: List[String] = mr.partitionBy.map {
      case Ident(segs) => segs.map(_.name).mkString(".")
      case other => throw new IllegalArgumentException(s"PARTITION BY must be columns: $other")
    }
    require(mr.orderBy.nonEmpty, "MATCH_RECOGNIZE requires ORDER BY") // rsql/ast.go:263-272
    val orderPaths: List[(List[Ident.Seg], Boolean)] = mr.orderBy.map { oi =>
      oi.expr match {
        case Ident(segs) => (segs, oi.asc)
        case other => throw new IllegalArgumentException(s"ORDER BY must be columns: $other")
      }
    }

    val inputSchema = df.schema
    val symbols: Set[String] = collectSymbols(mr)

    // measure output fields
    val measureFields: List[StructField] = mr.measures.map { m =>
      StructField(m.outputName, measureType(m.expr, inputSchema, symbols, mr.subsets),
        nullable = true)
    }
    val outSchema: StructType =
      if (mr.allRows) StructType(inputSchema.fields.toList ++ measureFields)
      else StructType(partNames.map(n => inputSchema(n)) ++ measureFields)

    val keyed = df.withColumn("__cep_key",
      if (partNames.isEmpty) lit("")
      else concat_ws("\u001f",
        partNames.map(n => coalesce(col(n).cast("string"), lit("\u0000NULL"))): _*))

    val fieldNames = inputSchema.fieldNames
    val mrLocal = mr
    val symbolsLocal = symbols
    val partNamesLocal = partNames
    val measureFieldsLocal = measureFields
    val keyIdx = keyed.schema.fieldIndex("__cep_key")

    val sortRows: Vector[Map[String, Any]] => IndexedSeq[Map[String, Any]] = maps => {
      // sort by ORDER BY (first key is the event timestamp — cep/engine.go:40)
      maps.indices.sortWith { (a, b) =>
        orderCompare(maps(a), maps(b), orderPaths) < 0
      }.map(maps).toIndexedSeq
    }
    val tsOfRow: Map[String, Any] => Long =
      m => RowEval.toMillis(pathValue(m, orderPaths.head._1))

    // row-local DEFINEs (no PREV/NEXT/aggregates/cross-symbol refs — the
    // common case) compile to a reusable zero-context predicate; each Spark
    // task deserializes its own RowLocalTest copy, so the mutable row slot
    // is task-confined
    val fastTests: Map[String, RowEval.RowLocalTest] =
      mrLocal.defines.flatMap { case (s, cond) =>
        RowEval.rowLocalAst(cond, s, symbolsLocal, mrLocal.subsets)
          .map(ast => s -> new RowEval.RowLocalTest(ast, s, mrLocal.subsets, symbolsLocal))
      }

    def defineTestFor(sorted: IndexedSeq[Map[String, Any]])(
        sym: String, pos: Int, acc: IndexedSeq[(Int, String)]): Boolean =
      fastTests.get(sym) match {
        case Some(t) => t.test(sorted(pos))
        case None => mrLocal.defines.get(sym) match {
          case None => true // undefined symbols always match (SURVEY §2.10)
          case Some(cond) =>
            val ctx = RowEval.Ctx(sorted, acc :+ (pos, sym), 0L,
              Some(acc.length), mrLocal.subsets, symbolsLocal)
            RowEval.truthy(RowEval.eval(cond, ctx))
        }
      }

    def emitMatch(sorted: IndexedSeq[Map[String, Any]], m: Matcher.Match,
        mn: Long): Iterator[Row] =
      if (mrLocal.allRows) {
        m.assignment.indices.iterator.map { ai =>
          val ctx = RowEval.Ctx(sorted, m.assignment, mn, Some(ai),
            mrLocal.subsets, symbolsLocal)
          val base = sorted(m.assignment(ai)._1)
          val vals = fieldNames.map(base(_)) ++
            mrLocal.measures.zip(measureFieldsLocal).map { case (me, f) =>
              coerce(RowEval.eval(me.expr, ctx), f.dataType)
            }
          Row.fromSeq(vals.toIndexedSeq)
        }
      } else {
        val ctx = RowEval.Ctx(sorted, m.assignment, mn, None,
          mrLocal.subsets, symbolsLocal)
        val firstRow = sorted(m.assignment.head._1)
        val vals = partNamesLocal.map(firstRow(_)) ++
          mrLocal.measures.zip(measureFieldsLocal).map { case (me, f) =>
            coerce(RowEval.eval(me.expr, ctx), f.dataType)
          }
        Iterator.single(Row.fromSeq(vals.toIndexedSeq))
      }

    // IDLETIMEOUT: processing-time flush of buffered runs on an idle key
    // (reference: window/watermark.go:108-124)
    val idleMs = q.options.get("IDLETIMEOUT")
      .map(graft.sql.Durations.toMillis).getOrElse(0L)
    val out =
      if (df.isStreaming)
        CepStream.run(keyed, keyIdx, fieldNames, outSchema, mrLocal, symbolsLocal,
          sortRows, tsOfRow, defineTestFor, emitMatch, idleMs,
          ttlMs = q.options.get("STATETTL")
            .map(graft.sql.Durations.toMillis).getOrElse(0L))
      else {
        // Secondary-sort formulation: Spark's spillable external sort orders
        // each key's rows (keys contiguous within a hash partition), then an
        // incremental matcher holds only the active WITHIN window — a skewed
        // key never materializes all its rows in one task's heap (the old
        // groupByKey.flatMapGroups buffered the full key before sorting).
        val sortCols: Seq[Column] = col("__cep_key").asc +:
          orderPaths.map { case (segs, asc) =>
            val c = segs.tail.foldLeft(col(segs.head.name))((cc, s) => cc.getField(s.name))
            if (asc) c.asc else c.desc
          }
        keyed
          .repartition(col("__cep_key"))
          .sortWithinPartitions(sortCols: _*)
          .mapPartitions { it =>
            val fidx = ArrayRowMap.index(fieldNames)
            val nf = fieldNames.length
            def toMap(r: Row): Map[String, Any] = {
              val vals = new Array[Any](nf)
              var i = 0
              while (i < nf) { vals(i) = r.get(i); i += 1 }
              new ArrayRowMap(fidx, fieldNames, vals)
            }
            var engine: CepIncremental = null
            var curKey: String = null
            val body = it.flatMap { r =>
              val key = r.getString(keyIdx)
              if (engine == null || key != curKey) {
                val tail =
                  if (engine == null) Iterator.empty[Row] else engine.finish()
                curKey = key
                engine = new CepIncremental(mrLocal, tsOfRow, defineTestFor, emitMatch)
                tail ++ engine.offer(toMap(r))
              } else engine.offer(toMap(r))
            }
            body ++ (if (engine == null) Iterator.empty[Row] else engine.finish())
          }(Encoders.row(outSchema))
      }

    // outer SELECT over (partition cols | input cols) + measures
    val projected = q.items match {
      case List(SelectItem(Star, _)) => out.toDF()
      case items =>
        val ctx = ExprBuilder.Ctx(
          resolveIdent = id => col(id.raw),
          onAggregate = fc => throw new IllegalArgumentException(
            s"aggregate ${fc.name} not allowed over MATCH_RECOGNIZE output"),
          onAnalytic = fc => throw new IllegalArgumentException(
            s"analytic ${fc.name} not allowed over MATCH_RECOGNIZE output"))
        out.toDF().select(items.map(it =>
          ExprBuilder.build(it.expr, ctx).as(it.outputName)): _*)
    }

    if (projected.isStreaming) return projected // per-batch sort/limit → Sinks
    val distincted = if (q.distinct) projected.distinct() else projected
    val ordered =
      if (q.orderBy.isEmpty) distincted
      else distincted.orderBy(q.orderBy.map { oi =>
        val c = oi.expr match {
          case id: Ident => col(id.raw)
          case other => throw new ParseException(
            s"ORDER BY over MATCH_RECOGNIZE output must be a column, got $other")
        }
        if (oi.asc) c.asc else c.desc
      }: _*)
    q.limit.map(ordered.limit).getOrElse(ordered)
  }

  // ------------------------------------------------------------- helpers

  private def collectSymbols(mr: MatchRecognize): Set[String] = {
    def syms(p: PatternNode): Set[String] = p match {
      case Pattern.Sym(n) => Set(n)
      case Pattern.Seq(ps) => ps.flatMap(syms).toSet
      case Pattern.Alt(ps) => ps.flatMap(syms).toSet
      case Pattern.Quant(c, _, _, _) => syms(c)
      case Pattern.Permute(ps) => ps.flatMap(syms).toSet
    }
    mr.pattern.map(syms).getOrElse(Set.empty) ++ mr.defines.keySet
  }

  private def pathValue(row: Map[String, Any], segs: List[Ident.Seg]): Any = {
    var cur: Any = row.getOrElse(segs.head.name, null)
    segs.tail.foreach { s =>
      cur = cur match {
        case r: Row => try r.getAs[Any](s.name) catch { case _: Throwable => null }
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].getOrElse(s.name, null)
        case _ => null
      }
    }
    cur
  }

  private def orderCompare(
      a: Map[String, Any], b: Map[String, Any],
      paths: List[(List[Ident.Seg], Boolean)]): Int = {
    paths.foreach { case (p, asc) =>
      val c = RowEval.compare(pathValue(a, p), pathValue(b, p))
      if (c != 0) return if (asc) c else -c
    }
    0
  }

  /** Static result type for a measure expression. */
  private def measureType(e: SqlExpr, schema: StructType, symbols: Set[String],
      subsets: Map[String, List[String]]): DataType = e match {
    // RUNNING/FINAL semantic markers are transparent wrappers
    case FuncCall(n, args, _, _)
        if n.equalsIgnoreCase("running") || n.equalsIgnoreCase("final") =>
      args.headOption.map(measureType(_, schema, symbols, subsets)).getOrElse(StringType)
    case FuncCall(n, _, _, _) if n.equalsIgnoreCase("match_number") => LongType
    case FuncCall(n, _, _, _) if n.equalsIgnoreCase("classifier") => StringType
    case FuncCall(n, _, _, _) if n.equalsIgnoreCase("count") => LongType
    case FuncCall(n, _, _, _)
        if n.equalsIgnoreCase("sum") || n.equalsIgnoreCase("avg") => DoubleType
    case FuncCall(n, args, _, _)
        if Set("min", "max", "first", "last", "prev", "next").contains(n.toLowerCase) =>
      args.headOption.map(measureType(_, schema, symbols, subsets)).getOrElse(DoubleType)
    case FuncCall(n, args, _, _) if n.equalsIgnoreCase("coalesce") =>
      args.headOption.map(measureType(_, schema, symbols, subsets)).getOrElse(StringType)
    case FuncCall(n, _, _, _) if Set("sqrt", "exp", "ln", "log", "log10", "log2",
        "sign", "round", "power", "pow", "mod", "abs").contains(n.toLowerCase) =>
      DoubleType
    case FuncCall(n, _, _, _) if Set("floor", "ceil", "ceiling", "length",
        "indexof").contains(n.toLowerCase) =>
      LongType
    case FuncCall(n, _, _, _) if Set("startswith", "endswith", "is_null",
        "is_not_null", "is_numeric").contains(n.toLowerCase) =>
      BooleanType
    case FuncCall(n, args, _, _)
        if Set("least", "greatest").contains(n.toLowerCase) =>
      // widest numeric argument type wins (RowEval returns the raw value)
      val ts = args.map(measureType(_, schema, symbols, subsets))
      if (ts.contains(DoubleType)) DoubleType
      else ts.headOption.getOrElse(DoubleType)
    case FuncCall(n, args, _, _)
        if Set("if_null", "ifnull", "null_if", "nullif").contains(n.toLowerCase) =>
      args.headOption.map(measureType(_, schema, symbols, subsets)).getOrElse(StringType)
    case FuncCall(n, args, _, _) if n.equalsIgnoreCase("cast") =>
      args.lift(1) match {
        case Some(StringLit(t)) => t.toLowerCase match {
          case "int" | "int32" | "bigint" | "int64" | "long" => LongType
          case "float" | "float64" | "double"                => DoubleType
          case "bool" | "boolean"                            => BooleanType
          case _                                             => StringType
        }
        case _ => StringType
      }
    case Ident(segs) =>
      val colName =
        if (segs.size >= 2 && (symbols.contains(segs.head.name) || subsets.contains(segs.head.name)))
          segs(1).name
        else segs.head.name
      schema.fields.find(_.name == colName).map(_.dataType).getOrElse(DoubleType)
    case NumberLit(t) => if (!t.exists(c => c == '.' || c == 'e' || c == 'E')) LongType else DoubleType
    case StringLit(_) => StringType
    case BoolLit(_) => BooleanType
    case BinOp(op, l, _) if Set("+", "-", "*", "/", "%").contains(op) =>
      measureType(l, schema, symbols, subsets) match {
        case LongType | IntegerType => LongType
        case t: TimestampType => LongType
        case _ => DoubleType
      }
    case BinOp(_, _, _) => BooleanType
    case CaseWhen(_, branches, _) =>
      measureType(branches.head._2, schema, symbols, subsets)
    case _ => StringType
  }

  private def coerce(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (n: Number, LongType) => n.longValue()
    case (t: java.sql.Timestamp, LongType) => t.getTime
    case (n: Number, DoubleType) => n.doubleValue()
    case (n: Number, IntegerType) => n.intValue()
    case (s, StringType) => s.toString
    case (b: Boolean, BooleanType) => b
    case (x, _) => x
  }
}

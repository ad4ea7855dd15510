package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import graft.sql._
import graft.cep.RowEval

/** Stateful operators the reference implements as in-process state machines
  * and Spark cannot express declaratively: counting windows
  * (reference: window/counting_window.go), GLOBAL WINDOW TRIGGER WHEN
  * (reference: window/global_window.go:50-58,197-253 — running aggregates,
  * fire-and-purge), and streaming analytics
  * (reference: stream/analytic.go).
  *
  * Both execution modes share the per-key logic: batch runs it via the
  * secondary-sort formulation ([[perKeySortedBatch]] — repartition on
  * keys, spillable external sort, incremental per-key processing, the
  * same shape as batch CEP); streaming via `flatMapGroupsWithState` with
  * the same state carried across micro-batches. Keys distribute across
  * executors — per-key state is bounded (buffer ≤ window size / open
  * windows only; global windows O(1)), so the operator scales with the
  * number of keys, and a skewed key spills in the sort instead of
  * materializing its history in one task's heap.
  */
object StatefulOps extends Serializable {

  private val KEYNULL = "\u0000NULL" // null-key sentinel
  private val KEYSEP = "\u001f"      // unambiguous key-tuple separator

  /** Event order: epoch-ms order column, then the optional TIEBREAK column —
    * ties at ms granularity must sort deterministically or per-key replays
    * diverge between runs (reference orders by (timestamp, arrival)). */
  private def ordLess(a: Map[String, Any], b: Map[String, Any],
      ordName: String, tieName: Option[String]): Boolean = {
    val ta = RowEval.toMillis(a(ordName)); val tb = RowEval.toMillis(b(ordName))
    if (ta != tb) ta < tb
    else tieName.exists(t =>
      RowEval.compare(a.getOrElse(t, null), b.getOrElse(t, null)) < 0)
  }


  // ------------------------------------------------------------ helpers

  private def rowToMap(names: Array[String], r: Row): Map[String, Any] =
    names.zipWithIndex.map { case (n, i) => n -> r.get(i) }.toMap

  /** Secondary-sort batch runner (same shape as batch CEP,
    * [[graft.cep.CepExec]]): repartition on the key columns, Spark's
    * spillable external sort orders each partition by (keys, ord, tie),
    * then each key's rows stream through a per-key processor — the
    * operator holds only its own bounded state, never a whole key's rows,
    * so a skewed key spills in the sort instead of materializing in one
    * task's heap (the groupByKey.flatMapGroups formulation buffered and
    * re-sorted the full key per task).
    *
    * `makeProc` returns (onRow, onKeyEnd) — fresh per key. */
  private def perKeySortedBatch(
      df: DataFrame, keyNames: List[String], ordName: String,
      tieName: Option[String], outSchema: StructType)(
      makeProc: () => (Map[String, Any] => Iterator[Row], () => Iterator[Row])): DataFrame = {
    val schema = df.schema
    val names = schema.fieldNames
    val keyIdx = keyNames.map(schema.fieldIndex)
    // no PARTITION BY → one global key: all rows to one sorted partition,
    // the same degenerate shape groupByKey produced (flagged non-scalable)
    val parts: Seq[Column] =
      if (keyNames.isEmpty) Seq(lit(1)) else keyNames.map(col)
    val sortCols: Seq[Column] =
      keyNames.map(col(_).asc) ++ (col(ordName).asc +: tieName.map(col(_).asc).toSeq)
    df.repartition(parts: _*)
      .sortWithinPartitions(sortCols: _*)
      .mapPartitions { it =>
        var curKey: String = null
        var started = false
        var onRow: Map[String, Any] => Iterator[Row] = null
        var onEnd: () => Iterator[Row] = null
        val body = it.flatMap { r =>
          val key = keyIdx.map(i =>
            if (r.isNullAt(i)) KEYNULL else String.valueOf(r.get(i))).mkString(KEYSEP)
          val tail: Iterator[Row] =
            if (!started || key != curKey) {
              val t = if (started) onEnd() else Iterator.empty[Row]
              curKey = key; started = true
              val (f, g) = makeProc(); onRow = f; onEnd = g
              t
            } else Iterator.empty[Row]
          tail ++ onRow(rowToMap(names, r))
        }
        body ++ (if (started) onEnd() else Iterator.empty[Row])
      }(Encoders.row(outSchema))
  }

  private def singleRowCtx(m: Map[String, Any]): RowEval.Ctx =
    RowEval.Ctx(IndexedSeq(m), IndexedSeq((0, "")), 0L, Some(0), Map.empty, Set.empty)

  private def evalOn(m: Map[String, Any], e: SqlExpr): Any =
    RowEval.eval(e, singleRowCtx(m))

  private def coerce(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (n: Number, LongType) => n.longValue()
    case (n: Number, DoubleType) => n.doubleValue()
    case (n: Number, IntegerType) => n.intValue()
    case (s, StringType) => s.toString
    case (b: Boolean, BooleanType) => b
    case (s: Seq[_], ArrayType(et, _)) => s.map(coerce(_, et))
    case (x, _) => x
  }

  /** Result type of a buffered aggregate slot. */
  private def aggType(fc: FuncCall, schema: StructType): DataType = {
    def argType: DataType = fc.args.headOption.flatMap {
      case Ident(segs) => schema.fields.find(_.name == segs.head.name).map(_.dataType)
      case _ => None
    }.getOrElse(DoubleType)
    fc.lname match {
      case "count" => LongType
      // sum keeps the argument's integer type (as the declarative batch
      // lowering does) — coerce() truncates the double accumulator back,
      // exact below 2^53
      case "sum" => argType match {
        case LongType | IntegerType => LongType
        case _                      => DoubleType
      }
      case "avg" | "stddev" | "stddevs" | "var" | "vars" |
           "median" | "percentile" => DoubleType
      case "min" | "max" | "first_value" | "last_value" | "nth_value" => argType
      case "collect" | "deduplicate" => ArrayType(argType)
      case "merge_agg" => StringType
      case _ => DoubleType
    }
  }

  private def aggValue(fc: FuncCall, rows: Seq[Map[String, Any]]): Any = {
    if (fc.lname == "count" && fc.args == List(Star)) rows.size.toLong
    else {
      val values = rows.map(r => evalOn(r, fc.args.head))
      val extra = fc.args.lift(1).collect { case n: NumberLit => n.toDouble }
      RowAgg.overBuffer(fc.lname, values, extra)
    }
  }

  // ------------------------------------------------- counting window

  /** CountingWindow(n) per group key: buffer rows, fire every n
    * (reference: window/counting_window.go — per-key buffers; STATETTL reaps
    * idle keys → streaming uses ProcessingTimeTimeout when ttlMs > 0).
    *
    * Input df must carry materialized key columns (`keyNames`) and an
    * epoch-ms order column (`ordName`). Output: keys + slot columns +
    * `__wstart`/`__wend` (min/max event time — the batch analog of the
    * reference's trigger timestamps).
    */
  def countingWindow(
      df: DataFrame,
      keyNames: List[String],
      n: Int,
      slots: List[(FuncCall, String)],
      ordName: String,
      ttlMs: Long = 0L,
      tieName: Option[String] = None,
      anCalls: List[(FuncCall, String)] = Nil): DataFrame = {

    val schema = df.schema
    val names = schema.fieldNames
    val resultFields =
      keyNames.map(k => schema(k)) ++
        slots.map { case (fc, sn) => StructField(sn, aggType(fc, schema), nullable = true) } ++
        List(StructField("__wstart", LongType), StructField("__wend", LongType))
    val resultSchema = StructType(resultFields)
    def anType(fc: FuncCall): DataType = fc.lname match {
      case "had_changed" => BooleanType
      case "acc_count" => LongType
      case acc if acc.startsWith("acc_") => DoubleType
      case n if graft.functions.FunctionMap.isCustomAnalytic(n) =>
        graft.functions.FunctionMap.customAnalyticResultType(n).getOrElse(DoubleType)
      case _ =>
        fc.args.collectFirst {
          case Ident(segs) if resultSchema.fieldNames.contains(segs.head.name) =>
            resultSchema(segs.head.name).dataType
        }.getOrElse(DoubleType)
    }
    val outSchema = StructType(resultFields ++
      anCalls.map { case (fc, an) => StructField(an, anType(fc), nullable = true) })

    // analytics across successive windows share per-key state (reference:
    // stream/stream.go:574-615); counting windows fire in event order per
    // key, so applying them at emit time matches the reference's order
    val customReg = customSnapshot()
    def emit(buf: Seq[Map[String, Any]],
        states: scala.collection.mutable.Map[String, AnState]): Row = {
      val keyVals = keyNames.map(buf.head(_))
      val ws = RowEval.toMillis(buf.head(ordName))
      val we = RowEval.toMillis(buf.last(ordName))
      val resMap: Map[String, Any] =
        keyNames.zip(keyVals).toMap ++
          slots.map { case (fc, sn) => sn -> aggValue(fc, buf) }.toMap +
          ("__wstart" -> ws) + ("__wend" -> we)
      val anVals = anCalls.map { case (fc, an) =>
        val st = states.getOrElseUpdate(an, AnState())
        coerce(applyAnalytic(fc, st, resMap, customReg), outSchema(an).dataType)
      }
      Row.fromSeq(keyVals ++
        slots.map { case (_, sn) => coerce(resMap(sn), resultSchema(sn).dataType) } ++
        Seq(ws, we) ++ anVals)
    }

    val keyIdx = keyNames.map(schema.fieldIndex)
    val grouped = df.groupByKey(r =>
      keyIdx.map(i => if (r.isNullAt(i)) KEYNULL else String.valueOf(r.get(i))).mkString(KEYSEP))(Encoders.STRING)

    type CState = (Vector[Map[String, Any]], Map[String, AnState])
    if (df.isStreaming) {
      val fn = (_: String, it: Iterator[Row], state: GroupState[CState]) => {
        if (state.hasTimedOut) {
          // STATETTL reaps the idle key's state — partial buffer AND
          // analytic state discarded (reference: counting_window.go:254-267);
          // no re-arm, or a quiet stream busy-loops on timeout batches
          state.remove()
          Iterator.empty
        } else {
        val incoming = it.map(r => rowToMap(names, r)).toVector
          .sortWith(ordLess(_, _, ordName, tieName))
        val st = state.getOption.getOrElse((Vector.empty[Map[String, Any]], Map.empty[String, AnState]))
        var buf = st._1 ++ incoming
        val states = scala.collection.mutable.Map[String, AnState]() ++ st._2
        val out = Vector.newBuilder[Row]
        while (buf.size >= n) {
          out += emit(buf.take(n), states)
          buf = buf.drop(n)
        }
        if (buf.isEmpty && states.isEmpty) state.remove()
        else {
          state.update((buf, states.toMap))
          if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
        }
        out.result().iterator
        }
      }
      val timeout =
        if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
      grouped.flatMapGroupsWithState(OutputMode.Append, timeout)(fn)(
        Encoders.kryo[CState], Encoders.row(outSchema))
    } else {
      perKeySortedBatch(df, keyNames, ordName, tieName, outSchema) { () =>
        var buf = Vector.empty[Map[String, Any]]
        val states = scala.collection.mutable.Map[String, AnState]()
        val onRow = (m: Map[String, Any]) => {
          buf :+= m
          if (buf.size == n) {
            val out = emit(buf, states); buf = Vector.empty
            Iterator.single(out)
          } else Iterator.empty[Row]
        }
        // trailing partial window is dropped (reference: counting windows
        // fire only on full counts)
        (onRow, () => Iterator.empty[Row])
      }
    }
  }

  // --------------------------------------------------- global window

  /** GLOBAL WINDOW TRIGGER WHEN pred: per-key running aggregates (O(1)
    * state), fire-and-purge when the predicate over aggregate values holds
    * (reference: window/global_window.go:197-253,445-520).
    *
    * `slots` must be O(1) aggregates; `trigger` is the predicate with
    * aggregate calls already rewritten to slot idents by the caller.
    */
  def globalWindow(
      df: DataFrame,
      keyNames: List[String],
      slots: List[(FuncCall, String)],
      trigger: SqlExpr,
      ordName: String,
      tieName: Option[String] = None): DataFrame = {

    val schema = df.schema
    val names = schema.fieldNames
    val outSchema = StructType(
      keyNames.map(k => schema(k)) ++
        slots.map { case (fc, sn) =>
          val dt = fc.lname match {
            case "count" => LongType
            case "min" | "max" | "first_value" | "last_value" =>
              aggType(fc, schema) match {
                case t @ (LongType | IntegerType | DoubleType | StringType |
                          TimestampType) => if (fc.lname == "min" || fc.lname == "max") DoubleType else t
                case _ => DoubleType
              }
            case _ => DoubleType
          }
          StructField(sn, dt, nullable = true)
        } ++
        List(StructField("__wstart", LongType), StructField("__wend", LongType)))

    type GState = (Map[String, RowAgg.Running], Long) // accumulators, window-start ms

    def process(stateIn: Option[(Map[String, RowAgg.Running], Long)],
        rows: Seq[Map[String, Any]]): (Vector[Row], Option[(Map[String, RowAgg.Running], Long)]) = {
      var accs = stateIn.map(_._1).getOrElse(
        slots.map { case (fc, sn) => sn -> RowAgg.Running() }.toMap)
      var wstart = stateIn.map(_._2).getOrElse(-1L)
      val out = Vector.newBuilder[Row]
      rows.foreach { m =>
        val ts = RowEval.toMillis(m(ordName))
        if (wstart < 0) wstart = ts
        slots.foreach { case (fc, sn) =>
          val v = if (fc.lname == "count" && fc.args == List(Star)) 1L
            else evalOn(m, fc.args.head)
          if (fc.lname == "count" && fc.args == List(Star)) accs(sn).add(1L)
          else accs(sn).add(v)
        }
        val slotVals: Map[String, Any] = slots.map { case (fc, sn) =>
          sn -> accs(sn).result(RowAgg.runningName(fc))
        }.toMap
        if (RowEval.truthy(evalOn(slotVals, trigger))) {
          val keyVals = keyNames.map(m(_))
          out += Row.fromSeq(keyVals ++
            slots.map { case (fc, sn) =>
              coerce(slotVals(sn), outSchema(sn).dataType)
            } ++ Seq(wstart, ts))
          // FIRE_AND_PURGE (reference: window/global_window.go:50-58)
          accs = slots.map { case (_, sn) => sn -> RowAgg.Running() }.toMap
          wstart = -1L
        }
      }
      (out.result(), Some((accs, wstart)))
    }

    val keyIdx = keyNames.map(schema.fieldIndex)
    val grouped = df.groupByKey(r =>
      keyIdx.map(i => if (r.isNullAt(i)) KEYNULL else String.valueOf(r.get(i))).mkString(KEYSEP))(Encoders.STRING)

    if (df.isStreaming) {
      val fn = (_: String, it: Iterator[Row], state: GroupState[GState]) => {
        val rows = it.map(r => rowToMap(names, r)).toVector
          .sortWith(ordLess(_, _, ordName, tieName))
        val (out, st) = process(state.getOption, rows)
        st.foreach(state.update)
        out.iterator
      }
      grouped.flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)(
        Encoders.kryo[GState], Encoders.row(outSchema))
    } else {
      perKeySortedBatch(df, keyNames, ordName, tieName, outSchema) { () =>
        var st: Option[GState] = None
        val onRow = (m: Map[String, Any]) => {
          val (out, st2) = process(st, Seq(m))
          st = st2
          out.iterator
        }
        (onRow, () => Iterator.empty[Row])
      }
    }
  }

  // ------------------------------------------------ streaming analytics

  /** Analytic state per call (reference: stream/analytic.go state machines +
    * functions/functions_analytical.go). Serialized via kryo across
    * micro-batches. */
  private[streaming] final case class AnState(
      var lagBuf: Vector[Any] = Vector.empty,
      var latest: Any = null,
      var acc: RowAgg.Running = RowAgg.Running(),
      var started: Boolean = false,
      var prevVals: Vector[Any] = Vector.empty,
      var seen: Boolean = false,
      var lastResult: Any = null,
      // user-registered state machine instance (graft.functions.CustomAnalytic)
      var custom: Any = null)

  /** Driver-side snapshot of the user-analytic registry, captured into
    * every operator closure — executor JVMs never see the global map. */
  private def customSnapshot(): Map[String, () => graft.functions.CustomAnalytic] =
    graft.functions.FunctionMap.customAnalyticsSnapshot()

  /** One window-result or event row through one analytic state machine
    * (WHEN gating replays the last result — stream/analytic.go:142-148).
    * Shared by the direct-path analytics and the window-path analytics
    * (tumblingWindowAnalytics). */
  private def applyAnalytic(fc: FuncCall, st: AnState, m: Map[String, Any],
      custom: Map[String, () => graft.functions.CustomAnalytic]): Any = {
    val gate = fc.over.flatMap(_.when).forall(c => RowEval.truthy(evalOn(m, c)))
    if (!gate) return st.lastResult
    val res: Any = fc.lname match {
      case "lag" =>
        val nOff = fc.args.lift(1).collect { case n: NumberLit => n.toLong.toInt }.getOrElse(1)
        val default = fc.args.lift(2).map(evalOn(m, _)).orNull
        val ignoreNull = fc.args.lift(3).collect { case BoolLit(b) => b }.getOrElse(false)
        val v = evalOn(m, fc.args.head)
        val r = if (st.lagBuf.size >= nOff) st.lagBuf(st.lagBuf.size - nOff) else default
        if (!ignoreNull || v != null) st.lagBuf = (st.lagBuf :+ v).takeRight(nOff)
        r
      case "latest" =>
        val v = evalOn(m, fc.args.head)
        if (v != null) st.latest = v
        val default = fc.args.lift(1).map(evalOn(m, _)).orNull
        if (st.latest != null) st.latest else default
      case acc if acc.startsWith("acc_") =>
        val startCond = fc.args.lift(1)
        val resetCond = fc.args.lift(2)
        resetCond.foreach { rc =>
          if (RowEval.truthy(evalOn(m, rc))) st.acc = RowAgg.Running()
        }
        if (!st.started)
          st.started = startCond.forall(sc => RowEval.truthy(evalOn(m, sc)))
        if (st.started) st.acc.add(evalOn(m, fc.args.head))
        val kind = acc.stripPrefix("acc_") match {
          case "count" => "count"; case "sum" => "sum"; case "avg" => "avg"
          case "min" => "min"; case "max" => "max"
        }
        if (!st.started) null else st.acc.result(kind)
      case "had_changed" | "changed_col" =>
        val (ignoreNull, colExprs) = fc.args match {
          case BoolLit(b) :: rest if rest.nonEmpty => (b, rest)
          case as => (true, as)
        }
        val vals = colExprs.map(evalOn(m, _)).toVector
        val changed =
          if (!st.seen) true
          else vals.zip(st.prevVals).exists { case (v, p) =>
            if (ignoreNull && v == null) false
            else if (p == null) v != null
            else v == null || RowEval.compare(v, p) != 0
          }
        // update state (nulls don't overwrite under ignoreNull)
        val newPrev =
          if (!st.seen) vals
          else vals.zip(st.prevVals).map { case (v, p) =>
            if (ignoreNull && v == null) p else v
          }
        st.prevVals = newPrev
        st.seen = true
        if (fc.lname == "had_changed") changed
        else if (changed) vals.head else null
      case other =>
        custom.get(other) match {
          case Some(factory) =>
            // user-registered state machine (reference: stream/analytic.go:93-114)
            if (st.custom == null) st.custom = factory()
            st.custom.asInstanceOf[graft.functions.CustomAnalytic]
              .apply(evalOn(m, fc.args.head))
          case None =>
            throw new IllegalArgumentException(s"unsupported streaming analytic $other")
        }
    }
    st.lastResult = res
    res
  }


  /** Streaming lowering of the direct-path analytics. All calls must share
    * one partition spec (the reference keeps independent per-call state;
    * a shared groupByKey keeps this a single shuffle).
    * Output = input columns + one column per call. */
  def analytics(
      df: DataFrame,
      calls: List[(FuncCall, String)],
      partitionNames: List[String],
      ordName: String,
      tieName: Option[String] = None,
      ttlMs: Long = 0L): DataFrame = {

    val schema = df.schema
    val names = schema.fieldNames

    val outSchema = StructType(schema.fields.toList ++
      calls.map { case (fc, n) => StructField(n, analyticType(fc, schema), nullable = true) })

    val customReg = customSnapshot()
    def apply1(fc: FuncCall, st: AnState, m: Map[String, Any]): Any =
      applyAnalytic(fc, st, m, customReg)


    def processRows(states: scala.collection.mutable.Map[String, AnState],
        rows: Seq[Map[String, Any]]): Iterator[Row] =
      rows.iterator.map { m =>
        val vals = names.map(m(_)) ++ calls.map { case (fc, n) =>
          val st = states.getOrElseUpdate(n, AnState())
          coerce(apply1(fc, st, m), outSchema(n).dataType)
        }
        Row.fromSeq(vals.toIndexedSeq)
      }

    val keyIdx = partitionNames.map(schema.fieldIndex)
    val grouped = df.groupByKey(r =>
      keyIdx.map(i => if (r.isNullAt(i)) KEYNULL else String.valueOf(r.get(i))).mkString(KEYSEP))(Encoders.STRING)

    if (df.isStreaming) {
      val fn = (_: String, it: Iterator[Row], state: GroupState[Map[String, AnState]]) => {
        if (state.hasTimedOut) {
          // STATETTL reaps the idle key's analytic state wholesale
          // (reference: LRU partition eviction, stream/analytic.go:18-21)
          state.remove()
          Iterator.empty
        } else {
          val rows = it.map(r => rowToMap(names, r)).toVector
            .sortWith(ordLess(_, _, ordName, tieName))
          val states = scala.collection.mutable.Map[String, AnState]() ++
            state.getOption.getOrElse(Map.empty)
          val out = processRows(states, rows).toVector
          state.update(states.toMap)
          if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
          out.iterator
        }
      }
      val timeout =
        if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout
      grouped.flatMapGroupsWithState(OutputMode.Append, timeout)(fn)(
        Encoders.kryo[Map[String, AnState]], Encoders.row(outSchema))
    } else {
      perKeySortedBatch(df, partitionNames, ordName, tieName, outSchema) { () =>
        val states = scala.collection.mutable.Map[String, AnState]()
        ((m: Map[String, Any]) => processRows(states, Seq(m)),
          () => Iterator.empty[Row])
      }
    }
  }

  /** [[analytics]] on Spark 4's `transformWithState` (STATEOP='tws'):
    * same per-key state machines hosted in a [[org.apache.spark.sql.streaming.StatefulProcessor]],
    * with the state-store-native TTL (`TTLConfig`) doing the idle-key
    * reaping the reference implements as LRU eviction
    * (reference: stream/analytic.go:18-21,386-394). Requires the RocksDB
    * state-store provider (`StreamSql.useRocksDBStateStore()`). */
  def analyticsTws(
      df: DataFrame,
      calls: List[(FuncCall, String)],
      partitionNames: List[String],
      ordName: String,
      tieName: Option[String] = None,
      ttlMs: Long = 0L): DataFrame = {
    import org.apache.spark.sql.streaming.{StatefulProcessor, TimeMode, TTLConfig, ValueState}

    val schema = df.schema
    val names = schema.fieldNames
    val outSchema = StructType(schema.fields.toList ++
      calls.map { case (fc, n) => StructField(n, analyticType(fc, schema), nullable = true) })
    val keyIdx = partitionNames.map(schema.fieldIndex)
    val customReg = customSnapshot()

    final class AnalyticsProcessor extends StatefulProcessor[String, Row, Row] {
      @transient private var anState: ValueState[Map[String, AnState]] = _

      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
        val ttl =
          if (ttlMs > 0) new TTLConfig(java.time.Duration.ofMillis(ttlMs))
          else TTLConfig.NONE
        anState = getHandle.getValueState[Map[String, AnState]](
          "an", Encoders.kryo[Map[String, AnState]], ttl)
      }

      override def handleInputRows(
          key: String, inputRows: Iterator[Row],
          timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Row] = {
        val rows = inputRows.map(r => rowToMap(names, r)).toVector
          .sortWith(ordLess(_, _, ordName, tieName))
        val states = scala.collection.mutable.Map[String, AnState]() ++
          (if (anState.exists()) anState.get() else Map.empty[String, AnState])
        val out = rows.map { m =>
          val vals = names.map(m(_)) ++ calls.map { case (fc, n) =>
            val st = states.getOrElseUpdate(n, AnState())
            coerce(applyAnalytic(fc, st, m, customReg), outSchema(n).dataType)
          }
          Row.fromSeq(vals.toIndexedSeq)
        }
        anState.update(states.toMap)
        out.iterator
      }
    }

    // state TTL is only legal under ProcessingTime time mode (Spark rejects
    // TTLConfig with TimeMode.None at query start)
    val timeMode = if (ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    df.groupByKey(r =>
        keyIdx.map(i => if (r.isNullAt(i)) KEYNULL else String.valueOf(r.get(i))).mkString(KEYSEP))(Encoders.STRING)
      .transformWithState(new AnalyticsProcessor, timeMode, OutputMode.Append())(
        Encoders.row(outSchema))
  }

  /** Output type of a direct-path analytic call (shared by the fMGWS and
    * transformWithState lowerings). */
  private def analyticType(fc: FuncCall, schema: StructType): DataType = fc.lname match {
    case "had_changed" => BooleanType
    case "acc_count" => LongType
    case "acc_sum" | "acc_avg" | "acc_min" | "acc_max" => DoubleType
    case n if graft.functions.FunctionMap.isCustomAnalytic(n) =>
      // declared result type wins; default double (custom machines fold
      // through toDouble) — never silently truncate to an int column type
      graft.functions.FunctionMap.customAnalyticResultType(n).getOrElse(DoubleType)
    case _ =>
      val colArg = fc.args.find {
        case _: Ident => true
        case _ => false
      }
      colArg.flatMap {
        case Ident(segs) => schema.fields.find(_.name == segs.head.name).map(_.dataType)
        case _ => None
      }.getOrElse(DoubleType)
  }

  // -------------------------- tumbling window + window-path analytics

  /** Per-key state for [[sessionWindowAnalytics]]. */
  final case class SessState(
      sessions: Vector[(Long, Long, Vector[Map[String, Any]])], // (start, lastTs, rows)
      maxTs: Long,
      an: Map[String, AnState],
      horizon: Long)

  /** Streaming session windows WITH analytics across successive sessions
    * (reference: window/session_window.go + stream/stream.go:574-615).
    * Sessions merge on gap overlap and finalize once the key's observed
    * watermark (maxTs − oooMs) passes lastTs + gap — no future row can
    * join a session whose gap horizon the watermark passed. Finalization
    * runs in start order; rows older than the finalized horizon drop.
    *
    * State note: this operator buffers the raw rows of each OPEN session
    * (it must — buffered aggregates like median/collect need them), the
    * same shape the reference keeps (session rows until trigger). Queries
    * without cross-window analytics use Spark's incremental
    * `session_window` aggregation instead and buffer nothing. */
  def sessionWindowAnalytics(
      df: DataFrame,
      keyNames: List[String],
      gapMs: Long,
      slots: List[(FuncCall, String)],
      anCalls: List[(FuncCall, String)],
      ordName: String,
      oooMs: Long,
      tieName: Option[String] = None,
      idleMs: Long = 0L,
      ttlMs: Long = 0L): DataFrame = {

    val schema = df.schema
    val names = schema.fieldNames
    val resultFields =
      keyNames.map(k => schema(k)) ++
        slots.map { case (fc, sn) => StructField(sn, aggType(fc, schema), nullable = true) } ++
        List(StructField("__wstart", LongType), StructField("__wend", LongType))
    val resultSchema = StructType(resultFields)
    def anType(fc: FuncCall): DataType = fc.lname match {
      case "had_changed" => BooleanType
      case "acc_count" => LongType
      case acc if acc.startsWith("acc_") => DoubleType
      case n if graft.functions.FunctionMap.isCustomAnalytic(n) =>
        graft.functions.FunctionMap.customAnalyticResultType(n).getOrElse(DoubleType)
      case _ =>
        fc.args.collectFirst {
          case Ident(segs) if resultSchema.fieldNames.contains(segs.head.name) =>
            resultSchema(segs.head.name).dataType
        }.getOrElse(DoubleType)
    }
    val outSchema = StructType(resultFields ++
      anCalls.map { case (fc, an) => StructField(an, anType(fc), nullable = true) })

    val customReg = customSnapshot()
    def process(stIn: Option[SessState], incoming: Vector[Map[String, Any]],
        closeAll: Boolean): (Vector[Row], SessState) = {
      val st = stIn.getOrElse(SessState(Vector.empty, Long.MinValue, Map.empty, Long.MinValue))
      var sessions = st.sessions
      var maxTs = st.maxTs
      incoming.foreach { m =>
        val ts = RowEval.toMillis(m(ordName))
        maxTs = math.max(maxTs, ts)
        if (ts >= st.horizon) {
          // absorb into every overlapping session, then merge the chain
          // strict on both sides: a row exactly gapMs away starts a new
          // session, matching the close condition e0 + gapMs <= wm
          val (overlap, rest) = sessions.partition { case (s0, e0, _) =>
            ts > s0 - gapMs && ts < e0 + gapMs }
          val merged =
            if (overlap.isEmpty) (ts, ts, Vector(m))
            else ((overlap.map(_._1) :+ ts).min, (overlap.map(_._2) :+ ts).max,
              overlap.flatMap(_._3) :+ m)
          sessions = (rest :+ merged).sortBy(_._1)
        }
      }
      val wm = if (closeAll) Long.MaxValue else maxTs - oooMs
      val states = scala.collection.mutable.Map[String, AnState]() ++ st.an
      val out = Vector.newBuilder[Row]
      var horizon = st.horizon
      val (toClose, open) = sessions.partition { case (_, e0, _) => e0 + gapMs <= wm }
      toClose.sortBy(_._1).foreach { case (s0, e0, rows) =>
        val buf = rows.sortWith(ordLess(_, _, ordName, tieName))
        val keyVals = keyNames.map(buf.head(_))
        val we = e0 + gapMs
        val resMap: Map[String, Any] =
          keyNames.zip(keyVals).toMap ++
            slots.map { case (fc, sn) => sn -> aggValue(fc, buf) }.toMap +
            ("__wstart" -> s0) + ("__wend" -> we)
        val anVals = anCalls.map { case (fc, an) =>
          val ast = states.getOrElseUpdate(an, AnState())
          coerce(applyAnalytic(fc, ast, resMap, customReg), outSchema(an).dataType)
        }
        out += Row.fromSeq(keyVals ++
          slots.map { case (_, sn) => coerce(resMap(sn), resultSchema(sn).dataType) } ++
          Seq(s0, we) ++ anVals)
        horizon = math.max(horizon, we)
      }
      (out.result(), SessState(open, maxTs, states.toMap, horizon))
    }

    val keyIdx = keyNames.map(schema.fieldIndex)
    val grouped = df.groupByKey(r =>
      keyIdx.map(i => if (r.isNullAt(i)) KEYNULL else String.valueOf(r.get(i))).mkString(KEYSEP))(Encoders.STRING)

    if (df.isStreaming) {
      val fn = (_: String, it: Iterator[Row], state: GroupState[SessState]) => {
        if (state.hasTimedOut) {
          // IDLETIMEOUT flushes open sessions on processing time
          // (reference: window/watermark.go:108-124). What remains after the
          // flush: cross-window analytic state is RETAINED (IDLETIMEOUT only
          // closes windows, it is not a reap) unless STATETTL explicitly
          // opts into reaping (reference: counting_window.go:254-267); keys
          // with no analytic state are dropped (nothing worth keeping —
          // reaped keys see later rows as a fresh stream, exactly like the
          // reference after state eviction).
          val stIn = state.getOption
          val hadOpen = stIn.exists(_.sessions.nonEmpty)
          val (out, stOut) = process(stIn, Vector.empty, closeAll = idleMs > 0)
          if (anCalls.nonEmpty && ttlMs == 0) state.update(stOut)
          else if (anCalls.nonEmpty && idleMs > 0 && hadOpen) {
            // idle flush emitted something — reap on the next TTL expiry
            state.update(stOut)
            state.setTimeoutDuration(ttlMs)
          } else state.remove() // pure-TTL reap discards partials wholesale
          out.iterator
        } else {
          val rows = it.map(r => rowToMap(names, r)).toVector
          val (out, stOut) = process(state.getOption, rows, closeAll = false)
          // a key whose sessions have fully flushed and that carries no
          // cross-window analytic state holds nothing worth keeping —
          // drop it so high-cardinality ephemeral keys don't accrete
          // (trade-off: the per-key lateness horizon goes with it, so a
          // row arriving later than the key's whole flushed history starts
          // a fresh stream — the reference behaves the same once STATETTL/
          // LRU eviction reaps a key)
          if (stOut.sessions.isEmpty && anCalls.isEmpty) state.remove()
          else {
            state.update(stOut)
            if (idleMs > 0) state.setTimeoutDuration(idleMs)
            else if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
          }
          out.iterator
        }
      }
      val timeout =
        if (idleMs > 0 || ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout
      grouped.flatMapGroupsWithState(OutputMode.Append, timeout)(fn)(
        Encoders.kryo[SessState], Encoders.row(outSchema))
    } else {
      // sorted input closes sessions incrementally in the same order the
      // whole-key pass would (disjoint sessions close in s0 order; a
      // closed session can never receive a later sorted row), so per-key
      // heap holds only the open sessions, not the key's full history
      perKeySortedBatch(df, keyNames, ordName, tieName, outSchema) { () =>
        var st: Option[SessState] = None
        val onRow = (m: Map[String, Any]) => {
          val (out, st2) = process(st, Vector(m), closeAll = false)
          st = Some(st2)
          out.iterator
        }
        (onRow, () => process(st, Vector.empty, closeAll = true)._1.iterator)
      }
    }
  }

  /** Per-key state for [[tumblingWindowAnalytics]]: open window buffers,
    * the key's max event time (its private watermark source), analytic
    * state across finalized windows, and the finalized horizon. */
  private[streaming] final case class TwState(
      buffers: Map[Long, Vector[Map[String, Any]]],
      maxTs: Long,
      an: Map[String, AnState],
      horizon: Long)

  /** Streaming tumbling window WITH analytics across successive windows
    * (reference: stream/stream.go:574-615 — window-path analytics keep
    * state across window emissions, auto-partitioned by the GROUP BY keys).
    *
    * Spark disallows a second stateful operator after a streaming
    * aggregation, so ONE `flatMapGroupsWithState` holds both the
    * per-window row buffers and the cross-window analytic state. A window
    * finalizes when the key's observed watermark (maxTs − oooMs) passes
    * its end; finalization runs in start order, which is exactly the order
    * the analytic state machines require. Late rows into finalized windows
    * are dropped (the reference drops sub-watermark rows the same way).
    *
    * `anCalls` arrive with aggregate arguments already rewritten to slot
    * idents, so they evaluate against the window-result row.
    */
  def tumblingWindowAnalytics(
      df: DataFrame,
      keyNames: List[String],
      sizeMs: Long,
      slots: List[(FuncCall, String)],
      anCalls: List[(FuncCall, String)],
      ordName: String,
      oooMs: Long,
      tieName: Option[String] = None,
      slideMs: Long = 0L,
      idleMs: Long = 0L,
      ttlMs: Long = 0L): DataFrame = {
    val slide = if (slideMs > 0) slideMs else sizeMs

    val schema = df.schema
    val names = schema.fieldNames

    val resultFields: List[StructField] =
      keyNames.map(k => schema(k)) ++
        slots.map { case (fc, sn) => StructField(sn, aggType(fc, schema), nullable = true) } ++
        List(StructField("__wstart", LongType), StructField("__wend", LongType))
    val resultSchema = StructType(resultFields)

    def anType(fc: FuncCall): DataType = fc.lname match {
      case "had_changed" => BooleanType
      case "acc_count" => LongType
      case acc if acc.startsWith("acc_") => DoubleType
      case n if graft.functions.FunctionMap.isCustomAnalytic(n) =>
        graft.functions.FunctionMap.customAnalyticResultType(n).getOrElse(DoubleType)
      case _ =>
        fc.args.collectFirst {
          case Ident(segs) if resultSchema.fieldNames.contains(segs.head.name) =>
            resultSchema(segs.head.name).dataType
        }.getOrElse(DoubleType)
    }
    val outSchema = StructType(resultFields ++
      anCalls.map { case (fc, n) => StructField(n, anType(fc), nullable = true) })

    val customReg = customSnapshot()
    def process(stIn: Option[TwState], incoming: Vector[Map[String, Any]],
        closeAll: Boolean): (Vector[Row], TwState) = {
      val st = stIn.getOrElse(TwState(Map.empty, Long.MinValue, Map.empty, Long.MinValue))
      val batchMax =
        if (incoming.isEmpty) Long.MinValue
        else incoming.iterator.map(m => RowEval.toMillis(m(ordName))).max
      val maxTs = math.max(st.maxTs, batchMax)
      val wm = if (closeAll) Long.MaxValue else maxTs - oooMs

      var bufs = st.buffers
      incoming.foreach { m =>
        val ts = RowEval.toMillis(m(ordName))
        // every window [ws, ws+size) with ws ≡ 0 (mod slide) containing ts
        var ws = math.floorDiv(ts, slide) * slide
        while (ws + sizeMs > ts) {
          if (ws >= st.horizon) // window not yet finalized
            bufs = bufs.updated(ws, bufs.getOrElse(ws, Vector.empty) :+ m)
          ws -= slide
        }
      }

      val states = scala.collection.mutable.Map[String, AnState]() ++ st.an
      val out = Vector.newBuilder[Row]
      var horizon = st.horizon
      val toClose = bufs.keys.filter(ws => ws + sizeMs <= wm).toList.sorted
      toClose.foreach { ws =>
        val buf = bufs(ws).sortWith(ordLess(_, _, ordName, tieName))
        val keyVals = keyNames.map(buf.head(_))
        val resMap: Map[String, Any] =
          keyNames.zip(keyVals).toMap ++
            slots.map { case (fc, sn) => sn -> aggValue(fc, buf) }.toMap +
            ("__wstart" -> ws) + ("__wend" -> (ws + sizeMs))
        val anVals = anCalls.map { case (fc, n) =>
          val s = states.getOrElseUpdate(n, AnState())
          coerce(applyAnalytic(fc, s, resMap, customReg), outSchema(n).dataType)
        }
        out += Row.fromSeq(keyVals ++
          slots.map { case (_, sn) => coerce(resMap(sn), resultSchema(sn).dataType) } ++
          Seq(ws, ws + sizeMs) ++ anVals)
        bufs -= ws
        horizon = math.max(horizon, ws + slide)
      }
      (out.result(), TwState(bufs, maxTs, states.toMap, horizon))
    }

    val keyIdx = keyNames.map(schema.fieldIndex)
    val grouped = df.groupByKey(r =>
      keyIdx.map(i => if (r.isNullAt(i)) KEYNULL else String.valueOf(r.get(i))).mkString(KEYSEP))(Encoders.STRING)

    if (df.isStreaming) {
      val fn = (_: String, it: Iterator[Row], state: GroupState[TwState]) => {
        if (state.hasTimedOut) {
          // IDLETIMEOUT (reference: window/watermark.go:108-124) flushes all
          // open windows on processing time. Cross-window analytic state is
          // RETAINED after the flush (IDLETIMEOUT is not a reap) unless
          // STATETTL explicitly opts into reaping (reference:
          // counting_window.go:254-267); keys with no analytic state drop —
          // later rows on a reaped key start a fresh stream, exactly like
          // the reference after state eviction.
          val stIn = state.getOption
          val hadOpen = stIn.exists(_.buffers.nonEmpty)
          val (out, st) = process(stIn, Vector.empty, closeAll = idleMs > 0)
          if (anCalls.nonEmpty && ttlMs == 0) state.update(st)
          else if (anCalls.nonEmpty && idleMs > 0 && hadOpen) {
            // idle flush emitted something — reap on the next TTL expiry
            state.update(st)
            state.setTimeoutDuration(ttlMs)
          } else state.remove() // pure-TTL reap discards partials wholesale
          out.iterator
        } else {
          val rows = it.map(r => rowToMap(names, r)).toVector
          val (out, st) = process(state.getOption, rows, closeAll = false)
          // drop fully-flushed keys with no analytic state — otherwise
          // high-cardinality ephemeral keys retain (maxTs, horizon) forever
          // (trade-off: the per-key lateness horizon goes with it — rows
          // later than the key's flushed history start a fresh stream, the
          // reference's own post-eviction behavior)
          if (st.buffers.isEmpty && anCalls.isEmpty) state.remove()
          else {
            state.update(st)
            if (idleMs > 0) state.setTimeoutDuration(idleMs)
            else if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
          }
          out.iterator
        }
      }
      val timeout =
        if (idleMs > 0 || ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout
      grouped.flatMapGroupsWithState(OutputMode.Append, timeout)(fn)(
        Encoders.kryo[TwState], Encoders.row(outSchema))
    } else {
      // same incremental argument as sessionWindowAnalytics: sorted input
      // finalizes windows in start order, a closed window can never
      // receive a later sorted row — per-key heap = open windows only
      perKeySortedBatch(df, keyNames, ordName, tieName, outSchema) { () =>
        var st: Option[TwState] = None
        val onRow = (m: Map[String, Any]) => {
          val (out, st2) = process(st, Vector(m), closeAll = false)
          st = Some(st2)
          out.iterator
        }
        (onRow, () => process(st, Vector.empty, closeAll = true)._1.iterator)
      }
    }
  }
}

package graft.plan

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.sql.Ident

/** Resolves dialect identifiers to Spark columns.
  *
  * Handles: stream-alias stripping (`stream.deviceId` → `deviceId`,
  * reference: rsql/parser.go:956-968), join-alias qualification
  * (`m.location` → the prefixed join column, reference:
  * stream/processor_field.go:58-107), nested dot-paths and array indices
  * (`device.info.name`, `sensors[0].value`, reference: utils/fieldpath).
  */
final class Resolver(
    baseColsOrdered: List[String],
    streamAliases: Set[String],
    joins: List[Resolver.JoinInfo],
    // schema-less payload escape hatch: a map<string,_> column whose keys
    // serve as virtual columns for identifiers no declared column matches
    // (reference accepts arbitrary map rows, types/row.go:27-31)
    dynMapCol: Option[String] = None
) {
  private val baseCols: Set[String] = baseColsOrdered.toSet

  def resolve(id: Ident): Column = {
    val segs0 = id.segments
    // strip the stream alias qualifier
    val segs =
      if (segs0.size > 1 && streamAliases.contains(segs0.head.name) &&
        segs0.head.indexes.isEmpty && !baseCols.contains(segs0.head.name))
        segs0.tail
      else segs0

    val head = segs.head
    joins.find(j => j.alias == head.name && head.indexes.isEmpty && segs.size > 1) match {
      case Some(j) =>
        val second = segs(1)
        nested(col(j.prefix + second.name), second.indexes, segs.drop(2))
      case None =>
        if (baseCols.contains(head.name))
          nested(col(head.name), head.indexes, segs.tail)
        else joins.find(_.contains(head.name)) match {
          case Some(j) => nested(col(j.prefix + head.name), head.indexes, segs.tail)
          case None => dynMapCol match {
            // unknown name on a map-payload table → map lookup (null when
            // absent, exactly the reference's missing-field behavior);
            // "__"-prefixed names stay plain (engine-internal columns)
            case Some(mc) if !head.name.startsWith("__") =>
              nested(element_at(col(mc), lit(head.name)), head.indexes, segs.tail)
            // fall through to plain resolution (computed/internal columns)
            case _ => nested(col(head.name), head.indexes, segs.tail)
          }
        }
    }
  }

  private def nested(root: Column, rootIdx: List[Ident.Idx], rest: List[Ident.Seg]): Column = {
    def sub(c: Column, i: Ident.Idx): Column = i match {
      // reference indexes 0-based with negative-from-end
      // (docs/NESTED_FIELD_ACCESS.md); element_at is 1-based positive /
      // negative-from-end, getItem is 0-based — pick per sign
      case Ident.IntIdx(i) if i >= 0 => c.getItem(i)
      case Ident.IntIdx(i)           => element_at(c, lit(i))
      case Ident.KeyIdx(k)           => c.getItem(k)
    }
    var c = root
    rootIdx.foreach(i => c = sub(c, i))
    rest.foreach { s =>
      c = c.getItem(s.name)
      s.indexes.foreach(i => c = sub(c, i))
    }
    c
  }

  /** Stream-side column names in declaration order (for whole-row
    * operations like `had_changed(true, *)`). */
  def baseColumnNames: List[String] = baseColsOrdered

  /** `SELECT *`: stream columns, then joined columns under their plain names
    * (skipping collisions with stream columns). */
  def starColumns: List[Column] = {
    val base = baseColsOrdered.map(col)
    val joined = joins.flatMap { j =>
      j.cols.collect {
        case c if !baseCols.contains(c) => col(j.prefix + c).as(c)
      }
    }
    base ++ joined
  }
}

object Resolver {
  final case class JoinInfo(alias: String, cols: List[String], prefix: String) {
    private[plan] val colSet: Set[String] = cols.toSet
    def contains(c: String): Boolean = colSet.contains(c)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SRT / WebVTT subtitle parsing — the text⇄media ALIGNMENT layer of a
  * video corpus: cues carry (start, end, text), which joins against the
  * codec-free [[Multimodal.mp4KeyframePlan]] byte-range index (e.g. via
  * [[Joins.asof]]) to pair caption text with the exact keyframe bytes a
  * GPU decoder would read — audio/visual-text training pairs with no
  * codec in the pipeline.
  *
  * Format scope, pinned: SubRip (`HH:MM:SS,mmm --> HH:MM:SS,mmm` blocks
  * with numeric index lines) and WebVTT (`WEBVTT` signature, dot
  * millisecond separator, optional hours, cue identifiers and
  * per-cue settings, NOTE/STYLE/REGION blocks skipped). Cue numbers are
  * assigned by WALK ORDER (1-based) — declared SRT indices can lie/skip
  * and are not trusted. Inline markup (`<i>`, `<c.cls>`, VTT
  * timestamp tags) strips; cue text lines join with '\n'. A payload
  * with no parseable cue at all → None. */
object SubtitleOps {

  /** One cue: 1-based walk order, times in ms, markup-stripped text. */
  case class Cue(cue: Int, start_ms: Long, end_ms: Long, text: String)

  private[graft] val timingPat = java.util.regex.Pattern.compile(
    "(?:(\\d+):)?(\\d{1,2}):(\\d{1,2})[.,](\\d{1,3})\\s*-->\\s*" +
      "(?:(\\d+):)?(\\d{1,2}):(\\d{1,2})[.,](\\d{1,3})")
  private val tagPat = java.util.regex.Pattern.compile("<[^>]*>")

  private def ms(h: String, m: String, s: String, frac: String): Long = {
    val hh = if (h == null) 0L else h.toLong
    // fractional digits are milliseconds left-aligned: "5" → 500 ms
    val f = (frac + "00").substring(0, 3).toLong
    hh * 3600000L + m.toLong * 60000L + s.toLong * 1000L + f
  }

  /** Parse one subtitle payload (format auto-detected). None when no cue
    * parses; `maxCues` refuses loudly rather than truncating. */
  def parseSubtitles(content: String, maxCues: Int = 100000): Option[Vector[Cue]] = {
    if (content == null) return None
    val text = content.stripPrefix("﻿")
    val lines = text.split("\r\n|\n|\r", -1)
    val out = Vector.newBuilder[Cue]
    var n = 0
    var i = 0
    // VTT signature line + anything until the first blank line is header
    if (lines.nonEmpty && lines(0).startsWith("WEBVTT")) {
      i = 1
      while (i < lines.length && lines(i).trim.nonEmpty) i += 1
    }
    while (i < lines.length) {
      // skip blank separators
      while (i < lines.length && lines(i).trim.isEmpty) i += 1
      if (i < lines.length) {
        val blockStart = i
        var end = i
        while (end < lines.length && lines(end).trim.nonEmpty) end += 1
        // locate the timing line inside the block (cue id / SRT index
        // lines precede it; NOTE/STYLE/REGION blocks have none)
        var t = blockStart
        var m: java.util.regex.Matcher = null
        while (m == null && t < end) {
          val mm = timingPat.matcher(lines(t))
          if (mm.find()) m = mm else t += 1
        }
        if (m != null) {
          n += 1
          if (n > maxCues) return None // loud cap
          val start = ms(m.group(1), m.group(2), m.group(3), m.group(4))
          val stop = ms(m.group(5), m.group(6), m.group(7), m.group(8))
          val body = lines.slice(t + 1, end)
            .map(l => tagPat.matcher(l).replaceAll("").trim)
            .filter(_.nonEmpty)
            .mkString("\n")
          out += Cue(n, start, stop, body)
        }
        i = end
      }
    }
    val cues = out.result()
    if (cues.isEmpty) None else Some(cues)
  }

  /** Cues over a (id, content) table — (idCol, sub_ok, cue, start_ms,
    * end_ms, text), one row per cue; unparseable rows flag, never
    * drop. */
  def cuePlan(
      df: DataFrame,
      contentCol: String = "content",
      idCol: String = "media_id",
      maxCues: Int = 100000): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, String)]
      .flatMap { case (id, content) =>
        parseSubtitles(content, maxCues) match {
          case Some(cs) => cs.map(c =>
            (id, true, Some(c.cue), Some(c.start_ms), Some(c.end_ms),
              Some(c.text)))
          case None => Seq((id, false, None, None, None, None))
        }
      }
      .toDF(idCol, "sub_ok", "cue", "start_ms", "end_ms", "text")
  }

  /** `subtitle_text(content)` → all cue text in order, '\n'-joined;
    * NULL when nothing parses — the subtitles-as-document shape for the
    * text pipeline. */
  lazy val subtitleTextCol: Column => Column = {
    val u = udf((s: String) =>
      parseSubtitles(s).map(_.map(_.text).filter(_.nonEmpty).mkString("\n")))
    c => u(c)
  }

  /** SRT/VTT fixture — construction literals:
    *   100. SRT (CRLF, numeric indices, one multi-line cue, an `<i>` tag)
    *   101. WebVTT: header line, a NOTE block, a cue identifier line,
    *        per-cue settings after the timing, hour-less timestamps, a
    *        class tag
    *   102. not a subtitle file. */
  def subtitleFixture(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    val srt = "1\r\n00:00:01,000 --> 00:00:04,500\r\nHello there.\r\n\r\n" +
      "2\r\n00:00:05,250 --> 00:00:07,000\r\n<i>Two lines</i>\r\nof text\r\n"
    val vtt = "WEBVTT\n\nNOTE this block is commentary\nand skipped\n\n" +
      "intro-cue\n01:05.000 --> 01:07.500 align:start\n" +
      "<c.yellow>Styled</c> cue\n\n" +
      "1:00:00.000 --> 1:00:02.000\nWith hours\n"
    Seq(
      100L -> srt,
      101L -> vtt,
      102L -> "just a plain text file, no timings anywhere"
    ).toDF("media_id", "content")
  }
}

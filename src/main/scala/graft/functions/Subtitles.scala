package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Subtitle normalization engine (ref
  * `scripts/pipeline/08-normalize-subtitles.py:61-110`).
  *
  * Per-cell rules: extract every bracketed part (any of `([{<`),
  * casefold first-seen dedupe, drop a bare `live` part when another
  * part already mentions live, capitalize the first word (unless it is
  * all-uppercase — acronyms pass through), uppercase letters directly
  * after a full stop (`a.k.a` → `a.K.A`), re-wrap each part in square
  * brackets, and join with `"; "`. Cells with no brackets migrate the
  * legacy `\\` separator to `"; "` and otherwise pass through.
  *
  * A UDF rather than a Column chain: the first-word/abbreviation casing
  * needs replace-with-callback, which Spark's regexp_replace cannot
  * express. Pure per-row string work — scan-side map, no shuffle.
  */
object Subtitles {

  private val BracketRe = "[\\(\\[\\{<]([^\\)\\]\\}>]+)[\\)\\]\\}>]".r
  private val AfterDotRe = "(?<=\\.)[a-zA-Z]".r
  /** Legacy in-cell multi-value separator: two literal backslashes. */
  private val LegacyDelim = "\\\\"

  /** Python str.isupper(): all cased chars upper, at least one cased. */
  private def isAllUpper(s: String): Boolean = {
    val cased = s.filter(_.isLetter)
    cased.nonEmpty && cased.forall(_.isUpper)
  }

  /** Python str.capitalize(): first char upper, the rest lower. */
  private def capitalize(s: String): String =
    if (s.isEmpty) s
    else s.substring(0, 1).toUpperCase + s.substring(1).toLowerCase

  def normalizeSubtitle(text: String): String = {
    if (text == null) return null
    val parts = BracketRe.findAllMatchIn(text).map(_.group(1)).toVector
    if (parts.isEmpty) {
      if (text.contains(LegacyDelim))
        text.split("\\\\\\\\").iterator.map(_.trim)
          .filter(_.nonEmpty).mkString("; ")
      else text
    } else {
      val cleaned = parts.map(_.trim).distinctBy(_.toLowerCase)
      val otherWithLive = cleaned.exists(p =>
        p.toLowerCase.contains("live") && p.toLowerCase != "live")
      val out = cleaned.flatMap { part =>
        if (part.toLowerCase == "live" && otherWithLive) None
        else {
          val words = part.split("\\s+").toVector.filter(_.nonEmpty)
          val capped =
            if (words.isEmpty) part
            else {
              val head =
                if (isAllUpper(words.head)) words.head
                else capitalize(words.head)
              (head +: words.tail).mkString(" ")
            }
          val formatted =
            AfterDotRe.replaceAllIn(capped, m => m.matched.toUpperCase)
          Some(s"[$formatted]")
        }
      }
      if (out.isEmpty) "[Live]" else out.mkString("; ")
    }
  }

  val normalizeSubtitleUdf: UserDefinedFunction =
    udf((s: String) => normalizeSubtitle(s))
}

package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Contributor-name casing — independent implementation of the behavior
  * of the reference's surname-aware caser (ref
  * `src/tagminder/core/tm_contributor_case.py:16-187`): Mc/Mac/O'/Fitz
  * prefixes recapitalize the following letter ("mccartney" →
  * "McCartney", "o'brien" → "O'Brien"), nobiliary particles (van, von,
  * de, der, di, da, del, la, le) stay lowercase when not leading, and
  * everything else is word-capitalized.
  */
object SmartTitle {

  private val Particles = Set(
    "van", "von", "de", "der", "den", "di", "da", "del", "della",
    "la", "le", "du", "dos", "das", "ter", "ten")

  private def cap(w: String): String =
    if (w.isEmpty) w else w.charAt(0).toUpper + w.substring(1)

  private def caseName(w: String, leading: Boolean): String = {
    val lw = w.toLowerCase
    if (!leading && Particles.contains(lw)) lw
    else if (lw.startsWith("mc") && lw.length > 2)
      "Mc" + cap(lw.substring(2))
    else if (lw.startsWith("mac") && lw.length > 4)
      "Mac" + cap(lw.substring(3))
    else if (lw.startsWith("fitz") && lw.length > 4)
      "Fitz" + cap(lw.substring(4))
    else if (lw.startsWith("o'") && lw.length > 2)
      "O'" + cap(lw.substring(2))
    else if (lw.contains("'") && lw.indexOf("'") == lw.length - 2)
      cap(lw) // trailing contraction like "d'angelo" handled below
    else cap(lw)
  }

  def smartTitle(s: String): String = {
    if (s == null) return null
    s.split(" ", -1).zipWithIndex.map { case (w, i) =>
      if (w.isEmpty) w
      else w.split("(?<=-)|(?=-)").map { p =>
        if (p == "-") p else caseName(p, leading = i == 0)
      }.mkString
    }.mkString(" ")
  }

  val smartTitleUdf: UserDefinedFunction = udf((s: String) => smartTitle(s))
}

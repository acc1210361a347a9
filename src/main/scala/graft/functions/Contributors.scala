package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

import graft.core.MultiValue

/** Contributor-cell parsing and dictionary normalization — the pure
  * logic behind pipeline steps 01 and 06.
  *
  * - involvedpeople parsing (ref `scripts/pipeline/01-...py:136-253`):
  *   entries are `person, RoleA, RoleB` joined by ` - `; a bare hyphen
  *   only separates entries when a comma appears on both sides (so
  *   hyphenated names survive). Role keys compare casefolded with
  *   spaces removed; people dedupe casefolded, first-seen order.
  * - staged dictionary normalization (ref `06-...py:438-529`): per
  *   delimited part — whole-part dictionary hit wins; then split on
  *   `;`, then commas (guarded against thousands groups and
  *   generational suffixes), then `/`; `&` splits only when every side
  *   resolves in the dictionary and the whole does not; unresolved
  *   hyphenated names pass through untouched; everything else falls
  *   back to [[SmartTitle]]. Output dedupes exact, first-seen order
  *   (dict.fromkeys semantics, 06-...py:522-525).
  *
  * The functions are deliberately plain Scala (the staging is genuinely
  * procedural — the reference itself drops to map_elements here); the
  * UDF closes over the dictionary, which Spark ships once per task. At
  * 100 TB wrap the dictionary in `sparkContext.broadcast` and build the
  * UDF from the broadcast handle — same code path, one copy per
  * executor.
  */
object Contributors {

  /** Stage-1 split inside one delimited part: `;` (the multi-value
    * delimiter itself was already split by the caller). */
  private val PrimarySplit = ";"

  /** Comma that is a list separator: not inside a thousands group
    * (`1,000`) and not before a generational suffix
    * (ref 06-...py COMMA_SPLIT_PATTERN). */
  private val CommaSplit =
    ",(?!\\d{3}(?:\\D|$))(?!\\s*(?:[Jj][Rr]|[Ss][Rr]|[Ii][Ii][Ii]|[Ii][Vv]|[Vv])\\b)"

  private val AmpSplit = "\\s*&\\s*"

  /** Split an involvedpeople string into `person, roles...` entries
    * (ref 01-...py:136-175): ` - ` when present; otherwise only at
    * hyphens with a comma on both sides. */
  def splitInvolvedEntries(raw: String): Seq[String] = {
    if (raw == null) return Seq.empty
    val s = raw.trim
    if (s.isEmpty) return Seq.empty
    if (s.contains(" - "))
      return s.split(" - ", -1).map(_.trim).filter(_.nonEmpty).toSeq
    val out = Vector.newBuilder[String]
    var start = 0
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '-') {
        val left = s.substring(start, i)
        val right = s.substring(i + 1)
        if (left.contains(",") && right.contains(",")) {
          val piece = left.trim
          if (piece.nonEmpty) out += piece
          start = i + 1
        }
      }
      i += 1
    }
    val tail = s.substring(start).trim
    if (tail.nonEmpty) out += tail
    out.result()
  }

  /** People credited under any of `roleKeys` (casefolded, spaces
    * removed) in an involvedpeople string; casefold-deduped in
    * first-seen order (ref 01-...py:176-214). */
  def peopleForRoles(raw: String, roleKeys: Set[String]): Seq[String] = {
    val seen = scala.collection.mutable.Set.empty[String]
    val out = Vector.newBuilder[String]
    splitInvolvedEntries(raw).foreach { entry =>
      val tokens = entry.split(",").map(_.trim).filter(_.nonEmpty)
      if (tokens.length >= 2) {
        val person = tokens.head
        val roles = tokens.tail
        val hit = roles.exists(r =>
          roleKeys.contains(r.toLowerCase.replace(" ", "")))
        if (hit && !seen.contains(person.toLowerCase)) {
          seen += person.toLowerCase
          out += person
        }
      }
    }
    out.result()
  }

  def peopleUdf: UserDefinedFunction =
    udf((s: String, roles: Seq[String]) => peopleForRoles(s, roles.toSet))

  /** Normalize one already-delimiter-split part through the staged
    * dictionary waterfall (ref 06-...py:438-529). */
  private def normalizePart(dict: Map[String, String], part: String): Seq[String] = {
    val p = if (part == null) "" else part.trim
    if (p.isEmpty) return Seq.empty
    dict.get(p.toLowerCase) match {
      case Some(c) => Seq(c)
      case None =>
        p.split(PrimarySplit).toSeq.map(_.trim).filter(_.nonEmpty).flatMap { chunk =>
          dict.get(chunk.toLowerCase).map(Seq(_)).getOrElse {
            chunk.split(CommaSplit).toSeq.map(_.trim).filter(_.nonEmpty).flatMap { cp =>
              dict.get(cp.toLowerCase).map(Seq(_)).getOrElse {
                cp.split("/").toSeq.map(_.trim).filter(_.nonEmpty).flatMap { sp =>
                  resolveAtom(dict, sp)
                }
              }
            }
          }
        }
    }
  }

  /** Innermost stage: conservative `&` split, then dictionary, then
    * hyphen passthrough, then smart-title fallback. */
  private def resolveAtom(dict: Map[String, String], atom: String): Seq[String] = {
    val a = atom.trim
    if (a.isEmpty) return Seq.empty
    if (a.contains("&")) {
      val sides = a.split(AmpSplit).map(_.trim).filter(_.nonEmpty)
      if (sides.length > 1 && !dict.contains(a.toLowerCase)
          && sides.forall(s => dict.contains(s.toLowerCase)))
        return sides.toSeq.map(s => dict(s.toLowerCase))
    }
    dict.get(a.toLowerCase) match {
      case Some(c) => Seq(c)
      case None if a.contains("-") => Seq(a) // AC-DC stays AC-DC
      case None => Seq(SmartTitle.smartTitle(a)).filter(_.nonEmpty)
    }
  }

  /** Normalize a full multi-value contributor cell: split on the
    * delimiter, run each part through the waterfall, dedupe exact
    * first-seen, re-join; empty result ⇒ null (the reference's
    * empty→NULL policy). */
  def normalizeCell(dict: Map[String, String], s: String): String = {
    if (s == null) return null
    val items = s.split(MultiValue.DelimRe).toSeq.flatMap(normalizePart(dict, _))
    val seen = scala.collection.mutable.Set.empty[String]
    val dedup = items.filter(i => seen.add(i))
    if (dedup.isEmpty) null else dedup.mkString(MultiValue.Delim)
  }

  /** UDF closing over the dictionary (driver-bounded, like the
    * reference's in-memory `contributors_dict`). */
  def normalizeUdf(dict: Map[String, String]): UserDefinedFunction =
    udf((s: String) => normalizeCell(dict, s))
}

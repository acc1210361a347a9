package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Generators: role/person fan-out and the guarded contributor split
  * (SURVEY §2.8 generators / §2.12).
  *
  * - Fan-out: the reference's involvedpeople field packs
  *   `role1:person1;role2:person2` into one string and expands it to
  *   per-role columns/rows (ref `scripts/pipeline/01-...py:136-253`).
  *   Re-expressed as pure expressions: split → struct transform →
  *   explode — codegen'd, no UDF.
  * - Guarded split: contributor strings split on `;` `/` `&` ` and `
  *   and on commas EXCEPT before generational/credential suffixes
  *   ("Jr", "Sr", "III", ...) (ref `06-...py:56-62, 457-527`). The
  *   lookbehind-with-alternatives rule needs real logic → small pure
  *   function behind a UDF.
  */
object Fanout {

  /** Expand `role:person;role:person` into an array of
    * (role, person) structs; malformed segments (no colon) yield a null
    * role with the raw segment as person. */
  def rolePersonPairs(c: Column): Column =
    transform(
      filter(split(c, ";"), seg => trim(seg) =!= ""),
      seg => struct(
        when(seg.contains(":"),
          trim(substring_index(seg, ":", 1))).as("role"),
        trim(when(seg.contains(":"),
          substring_index(seg, ":", -1)).otherwise(seg)).as("person")))

  /** Fan a packed column out to (idCol, role, person) rows. */
  def fanOut(df: DataFrame, idCol: String, packedCol: String): DataFrame =
    df.select(col(idCol),
      explode(rolePersonPairs(col(packedCol))).as("rp"))
      .select(col(idCol), col("rp.role").as("role"),
        col("rp.person").as("person"))

  /** Suffixes that guard the comma before them ("Smith, Jr" is one
    * name; "Smith, Jones" is two). */
  private val GuardedSuffixes = Set(
    "jr", "jr.", "sr", "sr.", "ii", "iii", "iv", "phd", "md", "esq")

  /** Guarded contributor split: delimiters `;` `/` `&` ` and ` always
    * split; a comma splits only when the next token is not a guarded
    * suffix. Tokens are trimmed, empties dropped, first-seen order
    * kept, duplicates removed (dict.fromkeys semantics, 06-...py:522-525). */
  def guardedSplit(s: String): Seq[String] = {
    if (s == null) return Seq.empty
    val coarse = s.split(";|/|&| and ").toSeq
    val fine = coarse.flatMap { part =>
      val pieces = part.split(",").toSeq
      // re-attach pieces whose content is a guarded suffix to their left
      pieces.foldLeft(Vector.empty[String]) { (acc, p) =>
        if (acc.nonEmpty && GuardedSuffixes.contains(p.trim.toLowerCase))
          acc.init :+ (acc.last + "," + p)
        else acc :+ p
      }
    }
    val trimmed = fine.map(_.trim).filter(_.nonEmpty)
    trimmed.distinct
  }

  val guardedSplitUdf: UserDefinedFunction = udf((s: String) => guardedSplit(s))
}

package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.{Exprs, MultiValue}
import graft.functions.{TextNorm, TitleCase}

/** Canonical pipeline steps re-expressed from the reference's numbered
  * scripts, as composable [[Transform]] values over a stringly-typed
  * alib-style table. Each step is convergent (second run changes
  * nothing), which [[Pipeline.run]]'s CDC audit verifies cheaply — the
  * changelog for a re-run is empty.
  */
object Steps {

  private def onCols(name: String, cols: Seq[String])(f: Column => Column) =
    Transform(name, cols,
      df => cols.foldLeft(df)((d, c) => d.withColumn(c, f(col(c)))))

  /** 02: mojibake/CRLF cleanup + whitespace collapse
    * (ref scripts/pipeline/02-...py:66-79). */
  def cleanText(cols: Seq[String]): Transform =
    onCols("02_clean_text", cols)(c =>
      when(c.isNull, c).otherwise(TextNorm.cleanWs(c)))

  /** 03/17-style blank normalization: TRIM + empty→NULL
    * (ref tm_polars null policy). */
  def normBlanks(cols: Seq[String]): Transform =
    onCols("03_norm_blanks", cols)(Exprs.normBlank)

  /** 17: multi-value dedupe — tokenize, order-preserving unique, rejoin
    * (ref scripts/pipeline/17-dedupe-columns.py:78-132). The candidate
    * filter (delimiter containment) is implicit: single-value cells
    * round-trip unchanged. */
  def dedupeMultiValue(cols: Seq[String]): Transform =
    onCols("17_dedupe_mv", cols)(MultiValue.normalize)

  /** 18-style NFKD normalization of name columns
    * (ref scripts/pipeline/18-...py:124-139). */
  def nfkdNames(cols: Seq[String]): Transform =
    onCols("18_nfkd", cols)(c =>
      when(c.isNull, c).otherwise(TextNorm.nfkdUdf(c)))

  /** Title-casing of display columns (ref tm_titlecase engine; the
    * engine converges, tm_titlecase.py:315-321). */
  def titleCase(cols: Seq[String]): Transform =
    onCols("07_titlecase", cols)(c =>
      when(c.isNull, c).otherwise(TitleCase.titleCaseUdf(c)))

  /** 20: date canonicalization to YYYY / YYYY-MM-DD via regex rewrites
    * over multi-value date cells (ref scripts/pipeline/20-...py:95-222):
    * dotted / slashed dates → dashed; bare years pass through;
    * unparseable values left intact (exceptions report separately). */
  def canonDates(cols: Seq[String]): Transform =
    onCols("20_canon_dates", cols) { c =>
      val dashed = regexp_replace(c,
        "^(\\d{4})[./](\\d{2})[./](\\d{2})$", "$1-$2-$3")
      when(c.isNull, c).otherwise(dashed)
    }

  /** The default cleanup pipeline in reference numbering order. */
  def defaultPipeline(textCols: Seq[String], mvCols: Seq[String],
                      dateCols: Seq[String]): Seq[Transform] = Seq(
    cleanText(textCols),
    normBlanks(textCols ++ mvCols ++ dateCols),
    dedupeMultiValue(mvCols),
    canonDates(dateCols))
}

package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared scalar Column expressions (no UDFs — everything codegen'd).
  * Each cites the reference behavior it re-expresses. */
object Exprs {

  /** TRIM + empty→NULL normalization (≙ tm_polars null/blank policy via
    * 17-...py:74-76, 20-...py:81-85; SQL form tm_changelog.py:65-82). */
  def normBlank(c: Column): Column = {
    val t = trim(c)
    when(t === "", lit(null)).otherwise(t)
  }

  /** md5 validity predicate: invalid if NULL / empty / "0" / all zeros
    * (hyphens stripped) — tm_polars.py:38-50. */
  def md5Valid(c: Column): Column = {
    val s = regexp_replace(coalesce(c, lit("")), "-", "")
    !(s === "" || s.rlike("^0+\\z"))
  }

  /** dirname: everything before the last '/' (≙ rsplit("/",1),
    * tm_album.py:34-46). */
  def dirname(path: Column): Column =
    when(path.contains("/"), regexp_extract(path, "^(.*)/[^/]*\\z", 1))
      .otherwise(lit(""))

  /** basename: everything after the last '/' (tm_changelog.py:85-94). */
  def basename(path: Column): Column =
    element_at(split(path, "/"), -1)

  /** album_root: collapse a trailing disc folder (`cd 01`, `Disc2`, …)
    * so multi-disc albums group as one (regex
    * `^(?:cd|disc)\s*0*\d{1,3}$` per component — tm_album.py:30-86).
    * Pure expression; the reference needed both a Python UDF and a Polars
    * expr for this — Spark needs neither. */
  def albumRoot(dirpath: Column): Column =
    regexp_replace(dirpath, "(?i)/(?:cd|disc)\\s*0*\\d{1,3}\\z", "")

  /** Money column → exact integer cents. Double sums of 2-decimal values
    * carry order-dependent ulp noise at scale; rounding to integral cents
    * makes results bit-deterministic across engines and shuffle orders. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Null-safe inequality (the CDC change predicate; ≙ null-safe change
    * expr 20-...py:230-237, 98-sync-...py:240-247). */
  def changed(oldC: Column, newC: Column): Column = !(oldC <=> newC)

  /** Safe division: NULL when denominator is 0 (≙ NULLIF pattern,
    * tm_snapshots.py:206). */
  def safeDiv(n: Column, d: Column): Column =
    when(d === 0, lit(null)).otherwise(n / d)
}

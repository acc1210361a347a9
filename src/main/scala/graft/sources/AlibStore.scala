package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The alib table lifecycle re-expressed over parquet (SURVEY §2.1
  * S4/S5/S9/S11, §2.9 M5-M8): keyed upsert, orphan pruning, export-DB
  * narrowing, table rebuild, rename with referential rewrite.
  *
  * The reference mutates one SQLite table in place; the Spark-native
  * equivalent is functional: each operation produces the next table
  * state as a DataFrame, and the caller persists with an overwrite (or
  * Delta MERGE where available). All operations are single-shuffle
  * joins/aggregations on the key — MERGE-shaped, 100 TB-safe.
  */
object AlibStore {

  /** S5: INSERT OR REPLACE-style upsert: incoming rows win on key
    * collision; rows absent from `incoming` survive unchanged.
    * Equivalent to Delta `MERGE WHEN MATCHED UPDATE WHEN NOT MATCHED
    * INSERT` (ref tags2db.py:345-415).
    *
    * When `incoming` itself holds several rows for one key, the
    * reference's INSERT OR REPLACE keeps the last-written one — an
    * ordering Spark DataFrames do not have. `tieBreak` columns (e.g. a
    * load timestamp, descending-first) reproduce last-write-wins; with
    * no tieBreak the keeper falls back to the lowest full-row hash, so
    * the result is stable across shuffles and reruns either way. */
  def upsert(current: DataFrame, incoming: DataFrame, key: String,
             tieBreak: Seq[String] = Nil): DataFrame = {
    val cols = current.columns
    val tagged = incoming.select(cols.map(col): _*).withColumn("__pri", lit(0))
      .unionByName(current.withColumn("__pri", lit(1)))
    val order = col("__pri") +:
      (if (tieBreak.nonEmpty) tieBreak.map(col(_).desc_nulls_last)
       else Seq(xxhash64(cols.map(col): _*).asc))
    val w = Window.partitionBy(key).orderBy(order: _*)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__pri", "__rn")
  }

  /** S5 + dynamic schema evolution: upsert where `incoming` may carry
    * columns the table has never seen (the reference ALTERs discovered
    * tag columns onto alib before the write, tags2db.py:295-311,
    * 660-670; Spark-native equivalent of parquet/Delta `mergeSchema`).
    * Both sides are widened to the union schema — existing rows read
    * NULL for brand-new columns, incoming rows NULL for columns they
    * lack — then the keyed upsert applies unchanged. */
  def upsertEvolving(current: DataFrame, incoming: DataFrame, key: String,
                     tieBreak: Seq[String] = Nil): DataFrame = {
    def widen(df: DataFrame, other: DataFrame): DataFrame =
      other.columns.filterNot(df.columns.contains).foldLeft(df)((d, c) =>
        d.withColumn(c, lit(null).cast(other.schema(c).dataType)))
    upsert(widen(current, incoming), widen(incoming, current), key, tieBreak)
  }

  /** S9: prune rows whose key no longer exists in `live` (ref
    * tags2db.py:1022-1079 set-difference delete) — a left-semi join. */
  def pruneOrphans(current: DataFrame, live: DataFrame, key: String): DataFrame =
    current.join(live.select(col(key)).distinct(), Seq(key), "left_semi")

  /** S11: export-DB builder — narrow to key + changed columns, rows
    * semi-joined to the changelog's touched keys (ref
    * 98-create-export-db.py:87-371: columns from `SELECT DISTINCT
    * alib_column`, rows from `WHERE __path IN (SELECT DISTINCT
    * alib_path ...)`). The changed-column set is collected to the
    * driver — it is bounded by the schema width, not the data. */
  def buildExport(alib: DataFrame, changelog: DataFrame, key: String,
                  systemCols: Seq[String]): DataFrame = {
    val changedCols = changelog.select("column").distinct()
      .collect().map(_.getString(0)).toSeq
    val keep = (systemCols ++ changedCols).distinct
      .filter(alib.columns.contains)
    val touched = changelog.select(col("key").as(key)).distinct()
    alib.join(touched, Seq(key), "left_semi")
      .select(keep.map(col): _*)
  }

  /** M5: reset the modification counter after export
    * (ref 99-reset-sqlmodded.py:49-52). */
  def resetSqlmodded(df: DataFrame): DataFrame =
    if (df.columns.contains("__sqlmodded"))
      df.withColumn("__sqlmodded", lit(null).cast("int"))
    else df

  /** M6: table rebuild dropping all-null non-system columns (ref
    * tags2db.py:740-891 — chunked counts + CREATE/INSERT/rename swap;
    * here: one aggregate over per-column non-null counts, then a
    * projection). */
  def rebuildDroppingEmpty(df: DataFrame, systemPrefix: String = "__"): DataFrame = {
    val counts = df.select(df.columns.map(c =>
      sum(when(col(c).isNotNull, 1).otherwise(0)).as(c)): _*)
      .collect().head
    val keep = df.columns.zipWithIndex.collect {
      case (c, i) if c.startsWith(systemPrefix) || counts.getLong(i) > 0 => c
    }
    df.select(keep.map(col): _*)
  }

  /** M8: rename keys with referential rewrite — applies a (old → new)
    * mapping to both the main table and the changelog's historical
    * references in one pass each (ref 98-rename-files-and-folders.py).
    * `renames` is small (driver-authored) → broadcast. */
  def renameWithRewrite(alib: DataFrame, changelog: DataFrame, key: String,
                        renames: DataFrame): (DataFrame, DataFrame) = {
    val r = broadcast(renames.select(col("old").as("__old"),
      col("new").as("__new")))
    val newAlib = alib.join(r, alib(key) === col("__old"), "left")
      .withColumn(key, coalesce(col("__new"), col(key)))
      .drop("__old", "__new")
    val newLog = changelog.join(r, changelog("key") === col("__old"), "left")
      .withColumn("key", coalesce(col("__new"), col("key")))
      .drop("__old", "__new")
    (newAlib, newLog)
  }

  /** P4: allowlist column nulling — NULL every non-keep, non-system
    * column (ref 01-...py:528-558), diff-logged by the CDC engine when
    * chained with [[graft.cdc.Cdc.diffAndLog]]. */
  def applyKeepColumns(df: DataFrame, keep: Set[String],
                       systemPrefix: String = "__"): DataFrame = {
    val dropped = df.columns.filterNot(c =>
      keep.contains(c) || c.startsWith(systemPrefix))
    dropped.foldLeft(df)((d, c) =>
      d.withColumn(c, lit(null).cast(df.schema(c).dataType)))
  }
}

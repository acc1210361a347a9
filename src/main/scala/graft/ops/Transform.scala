package graft.ops

import org.apache.spark.sql.DataFrame

import graft.cdc.Cdc

/** The reference's pipeline-step architecture (SURVEY §3.2, §7.1.5):
  * each numbered script reads working columns, applies a vectorized
  * transform, and funnels the result through the diff-and-log engine so
  * only changed rows write back and every field change is audited.
  *
  * Re-expressed as composable [[Transform]] values run by
  * [[Pipeline.run]]: one CDC diff per step, changelog entries tagged
  * with the step name (≙ the `script` column of the reference's
  * changelog), and the table state threaded functionally from step to
  * step. Steps are idempotent by construction when their expression is
  * convergent — re-running the pipeline emits zero changelog rows
  * (SURVEY §5.7), which CdcSpec/PipelineSpec assert.
  */
final case class Transform(
    name: String,
    cols: Seq[String],
    apply: DataFrame => DataFrame)

object Pipeline {

  /** Run steps in order over `table` (keyed by `keyCol`), auditing each
    * through [[Cdc.diffAndLog]]. Returns the final table state and the
    * unioned changelog. Values pass through the CDC engine as strings
    * (the reference's stringly-typed core), so `table` should be
    * string-typed on the transformed columns.
    */
  def run(table: DataFrame, keyCol: String,
          steps: Seq[Transform]): (DataFrame, DataFrame) = {
    var state = table
    var logs = Vector.empty[DataFrame]
    steps.foreach { step =>
      val next = step.apply(state)
      val (_, log) = Cdc.diffAndLog(state, next, keyCol, step.cols, step.name)
      logs :+= log
      state = next
    }
    val changelog = logs.reduce(_ unionByName _)
    (state, changelog)
  }
}

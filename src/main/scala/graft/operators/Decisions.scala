package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interactive disambiguation modeled as pending-decision tables
  * (SURVEY §7.4 risk 4) — the engine-side halves of pipeline steps 18
  * and 23.
  *
  * - Step 18 (ref `scripts/pipeline/18-...py:237-312`): a contributor
  *   (name, context) with exactly one candidate id auto-assigns; an
  *   ambiguous one consults the persisted `_USR_disambiguation_
  *   decisions` table (keyed by normalized name+context); whatever is
  *   still unresolved becomes a PENDING row for the user queue instead
  *   of blocking the pipeline.
  * - Step 23 (ref `scripts/pipeline/23-retire-synthetic-mbids.py:1-30,
  *   233-310`): a decision holding a synthetic id retires to the real
  *   id when EXACTLY one real candidate exists for the normalized
  *   name+context; ambiguous or absent candidates leave the synthetic
  *   assignment in place.
  *
  * Both are broadcast-join shapes: the decision/real tables are
  * user/harvest-scale (small), the candidate side is data-scale.
  */
object Decisions {

  /** The reference's match-key normalization (casefold + trim; its
    * unicode fold lives in the nfkd step upstream). */
  private def norm(c: Column): Column = lower(trim(c))

  /** Step 18. `candidates`: (name, context, cand_id) — one row per
    * candidate. `decisions`: (name, context, assigned_id).
    * @return (assigned, pending): assigned = (name, context,
    *   assigned_id, source ∈ unique|user_decision); pending = (name,
    *   context, n_candidates). */
  /** The shared join: candidate groups on the normalized key, left-
    * joined to the (deduplicated, broadcast) decision table. */
  private def joined(candidates: DataFrame,
                     decisions: DataFrame): DataFrame = {
    // group on the NORMALIZED key (the reference's keying): case or
    // whitespace variants of one contributor are one group — otherwise
    // two singleton variants would each auto-assign as "unique" with
    // conflicting ids. The minimum raw spelling represents the group.
    val uniq = candidates.groupBy(norm(col("name")).as("__kn"),
        norm(col("context")).as("__kc"))
      // the representative spelling must be a REAL input row (separate
      // min(name)/min(context) could combine fields from two variants)
      .agg(min(struct(col("name"), col("context"))).as("__rep"),
        countDistinct("cand_id").as("__n"), min("cand_id").as("__only"))
      .select(col("__kn"), col("__kc"), col("__n"), col("__only"),
        col("__rep.name").as("name"), col("__rep.context").as("context"))
    // one decision per normalized key: colliding decision rows (case /
    // whitespace variants) would fan the join out into contradictory
    // assignments — keep the deterministic max
    val dec = broadcast(decisions
      .select(norm(col("name")).as("__dn"), norm(col("context")).as("__dc"),
        col("assigned_id").as("__aid"))
      .groupBy("__dn", "__dc").agg(max("__aid").as("__aid")))
    uniq.join(dec, col("__kn") === col("__dn") &&
      col("__kc") === col("__dc"), "left")
  }

  /** Step 18, single-output form: every candidate group classified in
    * ONE pass — (name, context, assigned_id, source) with source ∈
    * unique | user_decision | pending (assigned_id null for pending).
    * Use this when the downstream is a combined report/queue table;
    * [[resolveWithDecisions]] splits the same classification into the
    * two tables the reference persists, at the cost of evaluating the
    * join per output. */
  def resolveAll(candidates: DataFrame, decisions: DataFrame): DataFrame =
    joined(candidates, decisions).select(col("name"), col("context"),
      when(col("__n") === 1, col("__only"))
        .otherwise(col("__aid")).as("assigned_id"),
      when(col("__n") === 1, lit("unique"))
        .when(col("__aid").isNotNull, lit("user_decision"))
        .otherwise(lit("pending")).as("source"))

  def resolveWithDecisions(candidates: DataFrame,
                           decisions: DataFrame): (DataFrame, DataFrame) = {
    val j = joined(candidates, decisions)
    val assigned = j.filter(col("__n") === 1 || col("__aid").isNotNull)
      .select(col("name"), col("context"),
        when(col("__n") === 1, col("__only")).otherwise(col("__aid"))
          .as("assigned_id"),
        when(col("__n") === 1, lit("unique")).otherwise(lit("user_decision"))
          .as("source"))
    // NOT-assigned, not `__n > 1`: a group whose cand_id values are all
    // NULL has __n = 0 (countDistinct skips nulls) — it must surface in
    // the pending queue (n_candidates = 0) rather than silently vanish
    // from both outputs (round-4 advice).
    val pending = j.filter(col("__n") =!= 1 && col("__aid").isNull)
      .select(col("name"), col("context"), col("__n").as("n_candidates"))
    (assigned, pending)
  }

  /** Step 23. `decisions`: (name, context, assigned_id,
    * decision_source). `real`: (name, context, real_id) — one row per
    * real candidate. `isSynthetic` recognizes synthetic ids (the
    * reference checks its uuid5 namespace).
    * @return (updated decisions, retirement proposals (name, context,
    *   synthetic_id, real_id)). */
  def retireSynthetic(decisions: DataFrame, real: DataFrame,
                      isSynthetic: Column => Column): (DataFrame, DataFrame) = {
    val uniqReal = real.groupBy(norm(col("name")).as("__rn"),
        norm(col("context")).as("__rc"))
      .agg(countDistinct("real_id").as("__nr"), min("real_id").as("__rid"))
      .filter(col("__nr") === 1)
    val j = decisions.join(broadcast(uniqReal),
      norm(col("name")) === col("__rn") &&
        norm(col("context")) === col("__rc"), "left")
    val retire = isSynthetic(col("assigned_id")) && col("__rid").isNotNull
    val updated = j.select(col("name"), col("context"),
      when(retire, col("__rid")).otherwise(col("assigned_id"))
        .as("assigned_id"),
      when(retire, lit("retired_to_real")).otherwise(col("decision_source"))
        .as("decision_source"))
    val proposals = j.filter(retire).select(col("name"), col("context"),
      col("assigned_id").as("synthetic_id"), col("__rid").as("real_id"))
    (updated, proposals)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog application — the MERGE/upsert semantics every lakehouse table
  * format ships (Delta MERGE, Iceberg upsert, Hudi): a batch of keyed change
  * rows (insert/update/delete, with a sequence number ordering changes to
  * the same key) folds into a base snapshot to produce the next snapshot.
  */
object Changelog {

  /** Apply `changes` to `base`. `changes` carries the base schema plus
    * `opCol` ('I'/'U'/'D' — I and U are both "latest row wins") and `seqCol`
    * (monotone change order, > Long.MinValue, distinct per key; the highest
    * seq per key is the effective change). Keys untouched by any change pass
    * through; an effective D removes the key; an effective I/U contributes
    * its row.
    *
    * Scale: base rows join the stream as virtual lowest-seq upserts, so the
    * whole merge is ONE key-keyed shuffle with map-side partial `max_by` —
    * no window sort over the change batch and no base-vs-changed-keys
    * anti-join (the window+anti-join shape pays two shuffles and a
    * per-key sort; this pays one partial-aggregable exchange, the same
    * plan a compacting LSM merge wants at 100 TB). Each value column gets
    * its own `max_by(value, seq)` rather than one `max_by(struct, seq)`:
    * a struct agg buffer is not UnsafeRow-mutable and forces SortAggregate
    * (two full sorts); per-column primitive buffers keep HashAggregate.
    * The delete op is likewise folded to a boolean before the agg.
    */
  def merge(base: DataFrame, changes: DataFrame, keyCol: String,
      seqCol: String = "seq", opCol: String = "op"): DataFrame = {
    val valueCols = base.columns.filterNot(_ == keyCol).toSeq
    val seqType = changes.schema(seqCol).dataType
    val baseTagged = base.select(
      (col(keyCol) +: valueCols.map(col)) ++
        Seq(lit(false).as("__del"), lit(Long.MinValue).cast(seqType).as(seqCol)): _*)
    val chTagged = changes.select(
      (col(keyCol) +: valueCols.map(col)) ++
        Seq((col(opCol) === "D").as("__del"), col(seqCol)): _*)
    val all = baseTagged.unionByName(chTagged)
    val aggs = valueCols.map(v => max_by(col(v), col(seqCol)).as(v)) :+
      max_by(col("__del"), col(seqCol)).as("__del")
    all.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
      .filter(!col("__del"))
      .select(col(keyCol) +: valueCols.map(col): _*)
  }

  /** Snapshot reconciliation — the table-diff every data-ops workflow needs
    * after a merge, backfill, or migration: keys added, removed, or updated
    * between two snapshots, with old/new values side by side. Unchanged
    * keys are omitted. Value comparison is null-safe (`<=>`), so a value
    * transitioning to/from NULL reports as updated.
    *
    * Scale: ONE key-keyed full outer join — both sides shuffle once on the
    * key (co-located if both snapshots are bucketed on it), nothing else.
    */
  def diff(before: DataFrame, after: DataFrame, keyCol: String): DataFrame = {
    val valueCols = before.columns.filterNot(_ == keyCol).toSeq
    val b = before.select(col(keyCol).as("__bk") +: valueCols.map(v => col(v).as(s"old_$v")): _*)
    val a = after.select(col(keyCol).as("__ak") +: valueCols.map(v => col(v).as(s"new_$v")): _*)
    val changed = valueCols.map(v => !(col(s"old_$v") <=> col(s"new_$v"))).reduce(_ || _)
    b.join(a, col("__bk") === col("__ak"), "full_outer")
      .withColumn("change_type",
        when(col("__bk").isNull, "added")
          .when(col("__ak").isNull, "removed")
          .otherwise("updated"))
      .filter(col("__bk").isNull || col("__ak").isNull || changed)
      .select(coalesce(col("__bk"), col("__ak")).as(keyCol) +: col("change_type") +:
        valueCols.flatMap(v => Seq(col(s"old_$v"), col(s"new_$v"))): _*)
  }

  /** Type-2 slowly-changing-dimension history from a changelog: each
    * effective I/U row opens a version valid over `[seq, next-change-seq)`;
    * a D closes the prior version without opening one (its seq becomes the
    * predecessor's `valid_to` via the lead). `is_current` marks open-ended
    * versions.
    *
    * Scale: one key-keyed window over the changelog (sorted within key by
    * seq) — the history build never touches a base snapshot, so it shuffles
    * only the change volume.
    */
  def scd2(changes: DataFrame, keyCol: String, seqCol: String = "seq",
      opCol: String = "op"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol))
    changes.withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .filter(col(opCol) =!= "D")
      .withColumnRenamed(seqCol, "valid_from")
      .withColumn("is_current", col("valid_to").isNull)
      .drop(opCol)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Changelog / retraction operators over ODF-style ledgers.
  *
  * An ODF ledger carries an operation-type column (reference vocabulary
  * `DatasetVocabulary::operation_type_column`; the engine passes op values
  * through unchanged — /root/reference/src/engine.rs op handling): 0 append,
  * 1 retract, 2 correct-from, 3 correct-to. A consumer that wants "current
  * state" rather than history needs snapshot compaction: the latest version
  * of every key, with keys whose latest record is a retraction (or the
  * from-half of a correction) dropped entirely.
  *
  * Scale shape: ONE aggregate on the key — `max_by(payload, version)` gets
  * a map-side partial (each task keeps one candidate row per key), so the
  * shuffle carries at most one row per key per task, not the history.
  * No window (which would sort every key's full history after a shuffle of
  * all of it) and no self-join (max-version lookup) — on a 100 TB ledger
  * with hot keys those shapes move orders of magnitude more data. The
  * struct-typed max_by buffer is var-length, so Spark plans a SortAggregate
  * rather than a HashAggregate: the sort is local, per-partition, over the
  * narrow projected ledger — still strictly cheaper than the shapes above,
  * whose shuffles move the full history.
  */
object Changelog {

  /** Ops whose presence as the LATEST record means the key is live. */
  val LiveOps: Seq[Int] = Seq(0, 3) // append, correct-to

  /** Compact a ledger to current state: latest record per key, dead keys
    * (latest op ∈ {retract, correct-from}) removed.
    *
    * @param versionCol total order within a key (ODF: the offset column —
    *                   unique, so `max_by` is deterministic)
    */
  def snapshot(
      ledger: DataFrame,
      keyCols: Seq[String],
      versionCol: String,
      opCol: String,
      liveOps: Seq[Int] = LiveOps): DataFrame = {
    val payload = ledger.columns.filterNot(keyCols.contains).toSeq
    val last = ledger
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), col(versionCol)).as("_last"))
      .select(keyCols.map(col) ++ payload.map(c => col(s"_last.`$c`").as(c)): _*)
    last.filter(col(opCol).isin(liveOps: _*))
  }

  /** Per-key version count and liveness — the ledger's "vacuum report"
    * (how much history a compaction would reclaim). Same single-aggregate
    * shape. */
  def historyStats(
      ledger: DataFrame,
      keyCols: Seq[String],
      versionCol: String,
      opCol: String,
      liveOps: Seq[Int] = LiveOps): DataFrame =
    ledger
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_versions"),
        max(col(versionCol)).as("last_version"),
        max_by(col(opCol), col(versionCol)).as("last_op"))
      .withColumn("is_live", col("last_op").isin(liveOps: _*))

  /** Convenience: a deterministic synthetic op column for tables that lack
    * one (test/demo ledgers): ~10% retractions, ~13% corrections, rest
    * appends — pure arithmetic on a unique id, reproducible in any engine. */
  def syntheticOp(uniqueId: Column): Column =
    when(uniqueId % 10 === 0, lit(1))
      .when(uniqueId % 7 === 0, lit(3))
      .otherwise(lit(0))
}

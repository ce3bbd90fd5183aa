package graft.bitemp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bitemporal core: point-in-time snapshot resolution and entity history.
  *
  * Data model (SURVEY §1.1): a `versions` DataFrame mirrors the reference's
  * entity index `EntityTx [eid vt tt tx-id content-hash]`
  * (crux-core/src/crux/codec.clj:809) —
  *
  *   eid: string        entity id (canonical form)
  *   vt: timestamp_ntz  valid-time start
  *   tt: timestamp_ntz  transaction-time
  *   tx_id: long        total order of transactions
  *   tombstone: boolean deletes are tombstone rows, content-hash nil in the
  *                      reference (crux-core/src/crux/tx.clj:81)
  *   + either a `content_hash` pointing into a docs table, or inline payload
  *     columns — the resolver is agnostic to payload.
  *
  * Semantics of `asOf` follow `entity-as-of`
  * (crux-core/src/crux/kv/index_store.clj:746-795): for each entity, the
  * version with the greatest (vt, tx_id) among those with vt ≤ VT and
  * tx ≤ basis wins; a winning tombstone hides the entity.
  *
  * Spark-first design: the resolver is an aggregation, not a window.
  * `max_by(struct(*), struct(vt, tx_id))` gets partial (map-side)
  * aggregation and AQE skew handling for free — one shuffle on eid, with
  * combiners, vs a window function's full sort-per-partition and no partial
  * aggregation. At 100 TB that is the difference between shuffling every
  * version ever written and shuffling one candidate row per (entity ×
  * map-partition).
  */
object Bitemp {
  val metaCols: Seq[String] = Seq("eid", "vt", "tt", "tx_id", "tombstone")

  /** Resolve the current-facts snapshot at (validTime, txId basis).
    *
    * Returns one row per live entity, same schema as `versions`.
    */
  def asOf(versions: DataFrame, validTime: Column, maxTxId: Column): DataFrame = {
    val payload = versions.columns.toSeq
    val candidate = versions
      .filter(col("vt") <= validTime && col("tx_id") <= maxTxId)
    candidate
      .groupBy(col("eid"))
      .agg(max_by(struct(payload.map(col): _*), struct(col("vt"), col("tx_id"))).as("_r"))
      .select("_r.*")
      .filter(!col("tombstone"))
  }

  /** As-of by transaction *time* instead of tx-id (the reference resolves a
    * tx-time basis to a tx-id first, crux-core/src/crux/query.clj:1931-1952;
    * here tt ≤ TT directly, equivalent for a monotonic log). */
  def asOfTime(versions: DataFrame, validTime: Column, txTime: Column): DataFrame = {
    val payload = versions.columns.toSeq
    versions
      .filter(col("vt") <= validTime && col("tt") <= txTime)
      .groupBy(col("eid"))
      .agg(max_by(struct(payload.map(col): _*), struct(col("vt"), col("tx_id"))).as("_r"))
      .select("_r.*")
      .filter(!col("tombstone"))
  }

  /** Entity history (crux-core/src/crux/kv/index_store.clj:524-554; API
    * crux-core/src/crux/query.clj:1859-1887).
    *
    * @param withCorrections when false, only the latest assertion per
    *   valid-time survives (partition-by vt + last, index_store.clj:537-538)
    * @param sortAsc order by valid-time asc/desc (tx_id breaks ties)
    * @param vtStart/vtEnd/ttStart/ttEnd optional basis range bounds
    */
  def history(
      versions: DataFrame,
      sortAsc: Boolean = true,
      withCorrections: Boolean = false,
      vtStart: Option[Column] = None,
      vtEnd: Option[Column] = None,
      ttStart: Option[Column] = None,
      ttEnd: Option[Column] = None): DataFrame = {
    var df = versions
    vtStart.foreach(b => df = df.filter(col("vt") >= b))
    vtEnd.foreach(b => df = df.filter(col("vt") < b))
    ttStart.foreach(b => df = df.filter(col("tt") >= b))
    ttEnd.foreach(b => df = df.filter(col("tt") < b))
    // latest correction per (eid, vt) — the ONE resolution implementation
    // (aggregation, not a window, for the same partial-agg scale reasons
    // as asOf); a tie-break change must hit snapshot and history alike
    val corrected = if (withCorrections) df else TxLog.resolvedHistory(df)
    val ord =
      if (sortAsc) Seq(col("eid"), col("vt").asc, col("tx_id").asc)
      else Seq(col("eid"), col("vt").desc, col("tx_id").desc)
    corrected.orderBy(ord: _*)
  }

  /** Speculative basis (`with-tx`, crux-core/src/crux/query.clj:1896-1913 /
    * crux-core/src/crux/fork.clj): union extra in-memory rows *before*
    * resolution; the resolver then treats them as the newest versions. */
  def withSpeculative(versions: DataFrame, speculative: DataFrame): DataFrame =
    versions.unionByName(speculative, allowMissingColumns = true)

  /** Valid-time interval view: turn point versions into [vt, vt_end) rows —
    * the classic bitemporal table view, handy for interval joins and for
    * oracle SQL. Window is per-entity ordered scan (history-shaped work,
    * SURVEY §2.5). */
  def intervals(versions: DataFrame): DataFrame = {
    val w = Window.partitionBy("eid").orderBy(col("vt").asc, col("tx_id").asc)
    versions.withColumn("vt_end", lead(col("vt"), 1).over(w))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** First-row-per-group "keeper" resolution — the dedup primitive
  * behind exact dedup (dd_exact: min doc_id per content hash) and URL
  * dedup (pipe_urlnorm: min doc_id per canonical URL), the batch twin
  * of the reference's firstSeen keyed-state dedup
  * (ProcessFuncDemo.scala firstSeen; StateDemo first-event-wins).
  *
  * Shape: two-phase hash-aggregate (min per key, map-side partials)
  * plus a shuffle-hash join back — NOT `min(id).over(partitionBy
  * (key))`: a viral key (a document duplicated millions of times, a
  * hot URL) is ONE window partition, and WindowExec would buffer+sort
  * all its rows on a single task, while the join streams them against
  * a 1-row-per-key build side. The accepted price is a second pruned
  * scan of the source (re-deriving the key column) — cheaper than the
  * hot-key sort at 100 TB, the same trade ShingleDf.capRare documents.
  *
  * Null-safe by construction: the join uses `<=>`, so NULL keys (NULL
  * text, NULL URL) form one group exactly as the window form and the
  * SQL oracles (`PARTITION BY key`) treat them. A plain inner
  * equi-join would silently DROP every NULL-keyed row — an
  * engine-vs-oracle row-count mismatch on dirty data.
  */
object Keeper {

  /** Attach `keeper` = min(`idCol`) over rows sharing `key`.
    * Result has all of `df`'s columns plus `keeper`. */
  def withKeeper(df: DataFrame, key: Column, idCol: String): DataFrame = {
    val tagged = df.withColumn("__kkey", key)
    val keep = tagged.groupBy(col("__kkey").as("__kkey_b"))
      .agg(min(col(idCol)).as("keeper"))
    tagged.join(keep.hint("shuffle_hash"),
        col("__kkey") <=> col("__kkey_b"))
      .drop("__kkey", "__kkey_b")
  }
}

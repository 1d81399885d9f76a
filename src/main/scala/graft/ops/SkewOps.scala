package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys (SURVEY §0 scale notes: a handful of Sui
  * objects — system clock, popular pools — receive orders of magnitude
  * more changes than the median key, which stalls a shuffle on `_id`).
  *
  * First line of defense is AQE's skew-join splitting (on by default).
  * When the skewed aggregation/join is known in advance, explicit salting
  * removes the straggler deterministically: explode the small side by the
  * salt domain, salt the big side from a stable per-row attribute, join on
  * (key, salt), and (for aggregates) re-aggregate the partials.
  */
object SkewOps {

  /** Deterministic salt in [0, n) derived from a stable per-row column
    * (e.g. the row's unique version/id — NOT rand(): keeps retries and
    * replays idempotent, same reasoning as the reference's idempotent
    * upserts). */
  def salt(n: Int, stable: Column): Column = pmod(hash(stable), lit(n))

  /** Skew-safe count per key: two-level aggregation — first on (key,
    * salt), then on key. A hot key fans across `n` reducers instead of
    * stalling one. `stable` is any per-row column with high cardinality. */
  def saltedCountByKey(df: DataFrame, key: String, stable: String, n: Int = 16): DataFrame =
    df.withColumn("__salt", salt(n, col(stable)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as("count"))

  /** Skew-safe equi-join of a big skewed side against a small side: the
    * small side is exploded `n`× (one copy per salt value) and the join key
    * becomes (key, salt). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      stable: String, n: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt", salt(n, col(stable)))
    val explodedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
    saltedBig.join(explodedSmall, Seq(key, "__salt")).drop("__salt")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join utilities (the "salting" lever from the scale
  * playbook; AQE's skew-join split is the first line of defense, this
  * is the explicit form for keys AQE can't split — e.g. a single hot
  * key whose partition exceeds every split threshold).
  *
  * Shape: the skewed (fact) side gets a random-ish salt in [0, n);
  * the small/replicable side is exploded n× with every salt value, so
  * each (key, salt) pair co-locates one fact slice with one dimension
  * replica. Deterministic salt (hash of a unique column, not rand())
  * keeps runs reproducible.
  */
object Skew {

  /** Salted inner equi-join: `fact ⋈ dim` on `key`, with `dim`
    * replicated `salts` times. Use when a hot `key` value overwhelms
    * one reducer; cost = dim inflated ×salts (keep dim the small
    * side).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
                 saltSource: Column): DataFrame = {
    require(salts > 1, "need at least 2 salt values")
    val saltedFact = fact.withColumn("_salt", pmod(hash(saltSource), lit(salts)))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Salted aggregation: two-phase `groupBy(key)` for a hot key —
    * partial aggregate on (key, salt), final on key. `agg2` must be
    * the re-aggregation of `agg1`'s output (sum of sums, max of
    * maxes...).
    */
  def saltedAgg(df: DataFrame, key: String, salts: Int, saltSource: Column,
                agg1: Seq[Column], agg2: Seq[Column]): DataFrame =
    df.withColumn("_salt", pmod(hash(saltSource), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(agg1.head, agg1.tail: _*)
      .groupBy(col(key))
      .agg(agg2.head, agg2.tail: _*)
}

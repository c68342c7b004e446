package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY §4).
  *
  * AQE's skew-join splitting (on in [[graft.Sessions]]) handles most
  * runtime skew; these are for the cases it can't: aggregation
  * hot-keys (AQE doesn't split a hash-aggregate partition) and joins
  * where one key dominates so heavily that even split shuffle blocks
  * all hash to one reducer lineage. The salt mixes the row's content
  * hash with its physical position (monotonically_increasing_id), so
  * even byte-identical duplicate rows — the canonical hot-key case —
  * spread across salts. Row→salt assignment is therefore not stable
  * across runs, but RESULTS are salt-invariant by construction
  * (asserted in SkewSpec), which is the determinism that matters.
  */
object Skew {

  private def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*),
      monotonically_increasing_id()), lit(salts))

  /** Equi-join `big ⋈ small` on `key`, with the big side split
    * `salts` ways and the small side replicated `salts` times, so a
    * hot key's rows spread over `salts` reducers instead of one.
    * Semantically identical to `big.join(small, key)`; costs a
    * `salts`× blow-up of the SMALL side only — use for dim-scale
    * small sides with a pathological hot key on the big side. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int = 16): DataFrame = {
    require(salts > 0)
    val b = big.withColumn("__salt", rowSalt(big, salts))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted partial → final) aggregation of `sum(valueCol)`
    * and counts per `key`: phase 1 aggregates (key, salt) so a hot
    * key's input spreads over `salts` reducers; phase 2 merges the
    * per-salt partials. Spark's hash aggregate already does map-side
    * partials — this adds a REDUCE-side split for keys whose partial
    * stream still overwhelms one task at 100 TB. */
  def saltedSum(df: DataFrame, key: String, valueCol: String, salts: Int = 16): DataFrame = {
    require(salts > 0)
    df.withColumn("__salt", rowSalt(df, salts))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("cnt"))
  }
}

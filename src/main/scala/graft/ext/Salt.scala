package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins: salt the skewed (large) side into `n`
  * sub-keys and replicate the small side across all salts, turning one
  * hot partition into `n` even ones.
  *
  * AQE's skew-join handles most cases at runtime (enabled in
  * GraftSession); explicit salting remains the tool when a single key
  * dwarfs everything (power-law keys at 100 TB) or when the join is
  * inside a cached/bucketed pipeline AQE can't re-plan.
  *
  * The salt is `pmod(hash(entire row), n)` — deterministic, so results
  * are reproducible run to run (no rand()).
  */
object Salt {

  /** Equi-join `large` with `small` on `key`, spreading each of
    * `large`'s keys over `n` salted sub-keys. Result equals the plain
    * inner join, with `large`'s hot keys split n ways. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 n: Int = 16): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(hash(large.columns.map(col): _*), lit(n)))
    val salts = small.sparkSession.range(n).select(col("id").cast("int").as("__salt"))
    val saltedSmall = small.crossJoin(broadcast(salts))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}

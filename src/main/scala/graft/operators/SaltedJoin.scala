package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join: spread hot join keys over `buckets` reducers.
  *
  * A plain shuffle join sends every row of a hot key to ONE reducer — at
  * 100 TB a single skewed key (a null-ish default, a bot user, a viral doc)
  * stalls the stage. Salting splits the hot side's rows across `buckets`
  * sub-keys and replicates the other side once per bucket, so the hot key's
  * work parallelizes at the cost of a `buckets`× blow-up of the (small)
  * replicated side.
  *
  * The salt is `pmod(hash(saltBy), buckets)` — a DETERMINISTIC function of a
  * caller-named column (ideally unique per row), not `rand()`: results and
  * retries stay reproducible, and speculative/re-executed tasks can't
  * produce different assignments (rand-salting breaks exactly-once sinks on
  * task retry).
  *
  * AQE's runtime skew-join handling (`spark.sql.adaptive.skewJoin`) covers
  * sort-merge joins after the fact; explicit salting remains the tool when
  * the skew is known ahead of time, the join is hash-based, or the engine
  * runs with AQE off (streaming plans, SURVEY.md §2.10).
  */
object SaltedJoin {

  /** Inner equi-join of `skewed` (hot side) with `other` on `key`,
    * salted into `buckets` sub-keys by `saltBy`.
    */
  def inner(skewed: DataFrame, other: DataFrame, key: String,
      saltBy: String, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val l = skewed.withColumn("_salt", pmod(hash(col(saltBy)), lit(buckets)))
    val r = other.withColumn("_salt",
      explode(array((0 until buckets).map(lit): _*)))
    l.join(r, Seq(key, "_salt"), "inner").drop("_salt")
  }
}

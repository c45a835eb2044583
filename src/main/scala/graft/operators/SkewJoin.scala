package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation equi-join via key salting.
  *
  * A hash-partitioned join sends every row of a hot key to one task; at
  * 100 TB one pathological key (a default value, an empty string, a
  * bot user id) stalls the stage. Salting splits each hot key's rows
  * across `salt` sub-partitions: the large side gets a uniform random
  * salt in [0, salt), the smaller side is replicated once per salt
  * value, and the join key becomes (key, salt) — same rows out,
  * `salt`-way parallelism per key in. Cost: the right side shuffles
  * `salt`× its size, so pick the side to replicate accordingly (or use
  * AQE's skew-join for moderate skew; salting is the deterministic
  * heavy-hammer for known-hot keys).
  */
object SkewJoin {

  def saltedEqui(large: DataFrame, replicated: DataFrame, keys: Seq[String],
      salt: Int = 16, seed: Long = 42L): DataFrame = {
    require(salt > 0, "salt must be positive")
    val l = large.withColumn("_salt", (rand(seed) * salt).cast("int"))
    val r = replicated.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, keys :+ "_salt").drop("_salt")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew-salting join (SURVEY §2b scale toolkit; AQE's skew-join
  * handles sort-merge skew automatically, this is the explicit form for
  * when a handful of hot keys dominate a 100 TB join).
  *
  * The skewed (big) side scatters each hot key across `salt` sub-keys;
  * the small side is replicated `salt` times. Each shuffle partition then
  * holds ~1/salt of a hot key's rows instead of all of them. Join result
  * is provably identical to the unsalted join (the salt column matches by
  * construction).
  */
object SkewJoin {

  def saltedInnerJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      salt: Int = 8): DataFrame = {
    val salted = big.withColumn(
      "__salt",
      pmod(xxhash64(col(bigKey), monotonically_increasing_id()), lit(salt)).cast("int"))
    val replicated = small.withColumn(
      "__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted
      .join(replicated, salted(bigKey) === replicated(smallKey) &&
        salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}

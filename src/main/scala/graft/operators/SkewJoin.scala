package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salting for skew-heavy equi-joins.
  *
  * A hot key (one user with 10% of all events, one near-duplicate cluster)
  * lands its entire row set in a single shuffle partition; at 100 TB that
  * is one straggler task hours behind the rest even with AQE's skew-join
  * splitting (which only helps sort-merge joins it can see the stats for).
  * Salting splits a hot key across `salts` partitions deterministically:
  * the big side gets salt = hash(whole row) mod salts, the small side is
  * replicated once per salt, and the join key becomes (key, salt). The
  * result multiset is exactly the plain equi-join's.
  */
object SkewJoin {

  private val SaltCol = "__graft_salt"
  private val RepCol = "__graft_salt_rep"

  /** General salted inner join: `cond` builds the equi-condition from
    * the two (salt-augmented) frames; the salt equality is appended.
    * Both sides carry merge hints — the replicated side is an exploded
    * frame whose size estimate undercounts by `salts`×, exactly the
    * shape the mis-broadcast trap bites.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, salts: Int)(
      cond: (DataFrame, DataFrame) => Column): DataFrame = {
    require(salts > 0, "salts must be positive")
    // Hash the whole row so identical keys spread; any per-row value works
    // for correctness — the salt only routes rows to partitions.
    val bigCols = big.columns.map(big.apply).toSeq
    val saltedBig = big.withColumn(SaltCol,
      pmod(hash(bigCols: _*), lit(salts)))
    val replicated = small.withColumn(RepCol,
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.hint("merge").join(replicated.hint("merge"),
        cond(saltedBig, replicated) &&
          saltedBig(SaltCol) === replicated(RepCol))
      .drop(SaltCol).drop(RepCol)
  }

  /** Inner equi-join of `big` (skewed side) with `small` on
    * `bigKey == smallKey`, salted `salts` ways. Output columns = big's
    * then small's, as a plain join would produce.
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, salts: Int): DataFrame =
    saltedJoin(big, small, salts)((b, s) => b(bigKey) === s(smallKey))
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** The salted join must be result-identical to the plain equi-join while
  * actually spreading a hot key across salt values.
  */
class SkewJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // hot key: 900 of 1000 rows share key 7
    val big = spark.range(0, 1000).toDF("i")
      .select(when(col("i") < 900, 7L).otherwise(col("i")).as("k"), col("i"))
    val small = Seq((7L, "hot"), (950L, "cold"), (999L, "cold")).toDF("k2", "tag")
    val salted = SkewJoin.saltedEquiJoin(big, small, "k", "k2", salts = 8)
      .select("k", "i", "tag")
    val plain = big.join(small, col("k") === col("k2")).select("k", "i", "tag")
    assert(salted.count() === plain.count())
    assert(rows(salted) === rows(plain))
  }

  test("the hot key actually spreads across salts") {
    val big = spark.range(0, 1000).toDF("i").select(lit(7L).as("k"), col("i"))
    val saltCount = big
      .withColumn("s", pmod(hash(col("k"), col("i")), lit(8)))
      .select("s").distinct().count()
    assert(saltCount > 4) // 1000 distinct rows hash into most of 8 salts
  }
}

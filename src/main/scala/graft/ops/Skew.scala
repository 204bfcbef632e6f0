package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling for joins whose hot keys AQE cannot always
  * rescue (e.g. when the skewed side is the output of a typed stage
  * with no shuffle statistics yet).
  *
  * [[saltedJoin]] spreads each hot key of the big side over `salts`
  * sub-keys (deterministic row-hash salt, replayable) and replicates
  * the small side `salts` times, so the shuffle partitions for a key
  * that holds 90% of the rows shrink by the salt factor. This is the
  * same move the crawl frontier uses for hot hosts (phase-A salted
  * selection) expressed as a general join operator.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, with the big side salted.
    * Result equals `big.join(small, key)` exactly (inner join).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 0)
    // scratch-column guard (same class as TemporalJoin's): withColumn
    // would silently overwrite an input column named __salt and the
    // join would drop it corrupted — fail loud instead
    val saltClash = (big.columns ++ small.columns).filter(_ == "__salt")
    require(saltClash.isEmpty,
            "saltedJoin: an input column is named __salt, colliding with " +
              "the reserved salt scratch column — rename it before joining")
    val bigS = big.withColumn(
      "__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts.toLong)))
    val smallS = small.withColumn(
      "__salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-k rows per group over a potentially skewed grouping column,
    * computed in two phases (salted partial top-k, then final merge) —
    * the window-function-free formulation that bounds task memory at
    * O(k) regardless of group size.
    */
  def topKByGroup(df: DataFrame, groupCol: String, orderCols: Seq[Column],
                  k: Int, salts: Int = 16): DataFrame =
    topKByGroups(df, Seq(groupCol), orderCols, k, salts)

  /** [[topKByGroup]] over a composite group key — partitioning on the
    * columns directly, so group values containing any would-be
    * separator byte cannot collide.
    */
  def topKByGroups(df: DataFrame, groupCols: Seq[String],
                   orderCols: Seq[Column], k: Int,
                   salts: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(groupCols.nonEmpty, "pass at least one grouping column")
    require(orderCols.nonEmpty, "pass a total ordering (include a tiebreak)")
    val reservedClash = df.columns.filter(Set("__salt", "__r").contains)
    require(reservedClash.isEmpty,
            s"topKByGroups: input columns ${reservedClash.mkString(", ")} " +
              "collide with reserved scratch names __salt/__r — rename " +
              "them first")
    val salted = df.withColumn(
      "__salt",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salts.toLong)))
    val w1 = Window
      .partitionBy(groupCols.map(col) :+ col("__salt"): _*)
      .orderBy(orderCols: _*)
    val partial = salted
      .withColumn("__r", row_number().over(w1))
      .filter(col("__r") <= k)
      .drop("__r")
    val w2 = Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
    partial
      .withColumn("__r", row_number().over(w2))
      .filter(col("__r") <= k)
      .drop("__r", "__salt")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot-key joins and aggregations.
  *
  * AQE's skew-join handling (on by default) covers sort-merge joins with
  * skewed *partitions*; explicit salting is still the tool when a single
  * join key dominates (the classic "null key" / "power user" shape at
  * 100 TB). The salt fans one hot build row out to `salts` copies, so
  * probe rows with the same key land on `salts` different reducers. */
object SkewOps {

  /** Salted inner equi-join. `fact` rows get a deterministic salt from
    * `factUnique` (any column unique-ish per row — an id, not the join
    * key); `dim` rows are replicated once per salt value. Result equals
    * `fact.join(dim, fact(key) === dim(key))` exactly, with the shuffle
    * spread over `salts`× more reducer keys. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: Column,
      dimKey: Column, factUnique: Column, salts: Int): DataFrame = {
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "inputs must not already contain a __salt column")
    val salted = fact.withColumn("__salt", pmod(hash(factUnique), lit(salts)))
    val fanned = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(fanned, factKey === dimKey &&
        salted("__salt") === fanned("__salt"))
      .drop("__salt")
  }

  /** Two-phase (salted partial → final) aggregation for hot group keys:
    * count/sum-style partial aggregates computed per (key, salt), then
    * combined per key. Decimal/long inputs keep exactness. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      unique: Column, salts: Int): DataFrame = {
    require(!df.columns.contains("__salt"),
      "input must not already contain a __salt column")
    df.withColumn("__salt", pmod(hash(unique), lit(salts)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(sum(value).as("__s"), count(lit(1)).as("__c"))
      .groupBy("k")
      .agg(sum("__s").as("sum_value"), sum("__c").cast("long").as("cnt"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inference-safe explode.
  *
  * `InferFiltersFromGenerate` infers `size(arr) > 0 AND isnotnull(arr)`
  * under a PLAIN explode/posexplode and — once CollapseProject inlines
  * the array expression — re-evaluates the whole array builder per
  * input row inside a Filter. For the engine's hottest map work
  * (tokenization, bigram zips, micro-int vector transforms, compiled
  * kernels) that is the same computation paid two or three times per
  * row (measured 23 s vs 0.6 s on the prefix-filter join; 2.3 → 1.5 s
  * on BPE encode). OUTER generates are exempt from the rule; the null
  * row an outer explode emits for an empty/null array is dropped on
  * the CHEAP generated attribute instead. Value-identical to the plain
  * form whenever the array has no null ELEMENTS — true for every
  * caller here (token arrays, zip structs, hash/product structs,
  * numeric transforms).
  */
private[graft] object Explodes {

  /** `select(keep..., explode_outer(arr) as name)` + null-drop. */
  def nonEmpty(df: DataFrame, arr: Column, name: String,
               keep: Column*): DataFrame =
    df.select(keep :+ explode_outer(arr).as(name): _*)
      .filter(col(name).isNotNull)

  /** `select(keep..., posexplode_outer(arr) as (pos, value))` +
    * null-drop. */
  def posNonEmpty(df: DataFrame, arr: Column, posName: String,
                  valName: String, keep: Column*): DataFrame =
    df.select(keep :+ posexplode_outer(arr).as(Seq(posName, valName)): _*)
      .filter(col(valName).isNotNull)
}

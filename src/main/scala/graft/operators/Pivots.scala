package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Long→wide matrix pivots (SURVEY.md §2.5 V1/V2) — the cBioPortal
  * CNA matrix writers (cnv.py:655-679, pedmatch:256-284).
  *
  * Scale notes (SURVEY.md §7.4 item 3): cBio matrices grow one column
  * per sample, so pivot values are ALWAYS passed explicitly (a prior
  * distinct pass) — never inferred — to avoid Catalyst's pivot-value
  * inference scan and its 10k-value cap surprises.
  */
object Pivots {

  /** Fail-on-duplicate pre-check replicating pandas pivot's ValueError
    * (cnv.py:657): returns the offending (idx, col) pairs; callers
    * raise when non-empty. */
  def duplicatePairs(df: DataFrame, idxCol: String, colCol: String): DataFrame =
    df.groupBy(idxCol, colCol).count().filter(col("count") > 1)

  /** V1: continuous matrix — one row per `idxCol`, one column per
    * pivot value, cells = first(valueCol) (unique by pre-check). */
  def continuous(df: DataFrame, idxCol: String, colCol: String,
                 valueCol: String, values: Seq[String]): DataFrame =
    df.groupBy(idxCol).pivot(colCol, values).agg(first(col(valueCol)))

  /** V2: discrete (GISTIC-like) matrix — nulls→0, all int
    * (cnv.py:670-679). */
  def discrete(df: DataFrame, idxCol: String, colCol: String,
               valueCol: String, values: Seq[String]): DataFrame = {
    val wide = df.groupBy(idxCol).pivot(colCol, values)
      .agg(first(col(valueCol)))
    val filled = wide.na.fill(0, values)
    filled.select(col(idxCol) +:
      values.map(v => col(v).cast("int").as(v)): _*)
  }
}

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

  /** NARROW matrix in one shuffle: when the cell value is itself an
    * aggregate, conditional aggregation —
    * `groupBy(idx).agg(agg(when(colCol = v, value)) per v)` — saves
    * `pivot`'s second exchange, and map-side partial aggregation
    * covers the idx × value matrix before the shuffle.
    *
    * MEASURED LIMIT: use only for narrow value lists (≲50). Every
    * input row evaluates ALL `values.length` predicates (O(rows ×
    * width) vs the pivot form's one pre-agg touch per row), and wide
    * aggregate lists fall out of whole-stage codegen — at width 500
    * on sf0.1 this form ran 20 s vs 1.8 s for pre-agg + `pivot`
    * (`continuous`), which is why `q_v3_wide` uses the latter.
    * `cell` builds the aggregate from the masked value column. */
  def continuousAgg(df: DataFrame, idxCol: String, colCol: String,
                    valueCol: String, values: Seq[String],
                    cell: Column => Column): DataFrame = {
    require(values.nonEmpty, "continuousAgg: empty pivot-value list")
    val cells = values.map(v =>
      cell(when(col(colCol) === v, col(valueCol))).as(v))
    df.groupBy(idxCol).agg(cells.head, cells.tail: _*)
  }

  /** Wide→long melt — the inverse of V1/V2, for reading a published
    * cBio matrix back into the long form every other operator speaks.
    * Map-only (one Expand pass — no shuffle, no per-column scan);
    * `dropNulls = true` drops empty cells so melt(pivot(x)) == x for
    * a duplicate-free long input (the round-trip law, property-
    * tested). All value columns must share one type — cast upstream
    * (the matrix writers emit uniform cells anyway). */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
           varName: String = "variable", valueName: String = "value",
           dropNulls: Boolean = true): DataFrame = {
    require(valueCols.nonEmpty, "melt: empty value-column list")
    val long = df.unpivot(idCols.map(col).toArray,
      valueCols.map(col).toArray, varName, valueName)
    if (dropNulls) long.filter(col(valueName).isNotNull) else long
  }

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

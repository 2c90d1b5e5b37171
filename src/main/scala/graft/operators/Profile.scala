package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/**
 * Column profiling — the data-quality pass a training pipeline runs
 * before trusting a new drop: per column, row/null/distinct counts
 * plus type-appropriate min/max. One output row per column.
 *
 * Two regimes, same schema:
 *  - `exact = true`: ONE BRANCH PER COLUMN, unioned. Putting all the
 *    count_distincts in a single aggregate makes Spark plan an Expand
 *    (c+1 copies of every row through the shuffle — measured 5×
 *    slower than the union at c = 5). The branches are each a
 *    column-PRUNED scan, so under a columnar source the union reads
 *    the same total bytes as one wide scan, with no row
 *    multiplication, and the independent branches schedule
 *    concurrently.
 *  - `exact = false` (the 100 TB default): approx_count_distinct HLL
 *    sketches — ONE pass over all columns, no Expand, all other
 *    measures unchanged and still exact.
 *
 * Numeric min/max surface as doubles, string min/max as strings —
 * never numeric-as-string (double formatting is engine-specific and
 * would break the oracle); each column fills only its own type's
 * slots. Everything is an order-free aggregate → hash-exact gate.
 */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    def measures(c: String, distinct: Column): Seq[Column] = {
      val numeric = types(c).isInstanceOf[NumericType]
      val str = types(c) == StringType
      Seq(
        sum(col(c).isNull.cast("long")).as(s"_null_$c"),
        distinct.as(s"_nd_$c"),
        (if (numeric) min(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"_min_$c"),
        (if (numeric) max(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"_max_$c"),
        (if (str) min(col(c)) else lit(null).cast("string")).as(s"_smin_$c"),
        (if (str) max(col(c)) else lit(null).cast("string")).as(s"_smax_$c"))
    }
    def entry(c: String): Column =
      struct(lit(c).as("col_name"), col("_rows").as("n_rows"),
        col(s"_null_$c").as("n_null"), col(s"_nd_$c").as("n_distinct"),
        col(s"_min_$c").as("min_num"), col(s"_max_$c").as("max_num"),
        col(s"_smin_$c").as("min_str"), col(s"_smax_$c").as("max_str"))
    if (exact) {
      cols.map { c =>
        val aggs = count(lit(1)).as("_rows") +: measures(c, count_distinct(col(c)))
        df.select(col(c))
          .agg(aggs.head, aggs.tail: _*)
          .select(entry(c).as("p")).select(col("p.*"))
      }.reduce(_.unionByName(_))
    } else {
      val aggs = count(lit(1)).as("_rows") +:
        cols.flatMap(c => measures(c, approx_count_distinct(col(c))))
      val one = df.agg(aggs.head, aggs.tail: _*)
      // one wide row → one row per column (array of structs + explode
      // stays a local projection; no extra shuffle)
      one.select(explode(array(cols.map(entry): _*)).as("p")).select(col("p.*"))
    }
  }

  /**
   * Per-column HEAVY-KEY report — the skew-detection pass that decides
   * which join keys need salting / AQE skew handling BEFORE a 100 TB
   * join hits them: the k most frequent values per column with their
   * counts. One map-side-combined aggregate plus a bounded
   * TakeOrdered per column (total (n desc, value) order — ties are
   * deterministic); values surface as strings so mixed column types
   * share one report row shape.
   */
  def heavyKeys(df: DataFrame, cols: Seq[String], k: Int = 5): DataFrame = {
    require(cols.nonEmpty, "heavyKeys needs at least one column")
    require(k >= 1, "heavyKeys needs k >= 1")
    cols.map { c =>
      df.groupBy(col(c).cast("string").as("value"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("value")).limit(k)
        .select(lit(c).as("col_name"), col("value"), col("n"))
    }.reduce(_ unionByName _)
  }
}

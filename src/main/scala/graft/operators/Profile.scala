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
 *  - `exact = true`: distinct counts via count_distinct. Spark plans
 *    multi-column distinct aggregation with an Expand (c× the input
 *    rows through the shuffle) — fine for gates and small c, the
 *    honest cost of exactness.
 *  - `exact = false` (the 100 TB default): approx_count_distinct HLL
 *    sketches — ONE map-side-combinable pass, no Expand, all other
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
    def distinctOf(c: String): Column =
      if (exact) count_distinct(col(c)) else approx_count_distinct(col(c))
    val aggs = count(lit(1)).as("_rows") +: cols.flatMap { c =>
      val numeric = types(c).isInstanceOf[NumericType]
      val str = types(c) == StringType
      Seq(
        sum(col(c).isNull.cast("long")).as(s"_null_$c"),
        distinctOf(c).as(s"_nd_$c"),
        (if (numeric) min(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"_min_$c"),
        (if (numeric) max(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"_max_$c"),
        (if (str) min(col(c)) else lit(null).cast("string")).as(s"_smin_$c"),
        (if (str) max(col(c)) else lit(null).cast("string")).as(s"_smax_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // one wide row → one row per column (array of structs + explode
    // stays a local projection; no extra shuffle)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"), col("_rows").as("n_rows"),
        col(s"_null_$c").as("n_null"), col(s"_nd_$c").as("n_distinct"),
        col(s"_min_$c").as("min_num"), col(s"_max_$c").as("max_num"),
        col(s"_smin_$c").as("min_str"), col(s"_smax_$c").as("max_str"))
    }
    one.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }
}

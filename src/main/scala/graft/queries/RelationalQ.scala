package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.io.Tables

/** Relational surface (SURVEY.md §2.7) — the operators the reference
  * lacks but a user of this engine gets from Spark, demonstrated on the
  * TPC-H-ish tables.
  *
  * Exact-arithmetic convention: monetary/quantity doubles in the test
  * data carry ≤2 decimal digits, so they convert exactly (and
  * identically in Spark and DuckDB) to decimals; sums/products are then
  * exact and order-independent, and the final cast to double is
  * correctly rounded on both engines → bitwise-stable hash compares.
  */
object RelationalQ {

  private def dec(c: Column, p: Int, s: Int): Column = c.cast(DecimalType(p, s))

  /** TPC-H Q1-shaped pricing summary: filter → hash agg with map-side
    * partial aggregation; no join, one shuffle on the 6-row group key.
    */
  val q1Agg = Q(
    "q1_agg",
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      val disc = dec(col("l_extendedprice"), 12, 2) * (lit(1) - dec(col("l_discount"), 4, 2))
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"), 12, 2)).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"), 12, 2)).cast("double").as("sum_base_price"),
          sum(disc).cast("double").as("sum_disc_price"),
          sum(disc * (lit(1) + dec(col("l_tax"), 4, 2))).cast("double").as("sum_charge"),
          (sum(dec(col("l_quantity"), 12, 2)).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(dec(col("l_extendedprice"), 12, 2)).cast("double") / count(lit(1))).as("avg_price"),
          (sum(dec(col("l_discount"), 4, 2)).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
        CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")
  )

  def all: Seq[Q] = Seq(q1Agg)
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Catalog/schema introspection (S6).
  *
  * Reference: column name/type/ordinal read from
  * `information_schema.columns` (`/root/reference/utilities/etl.py:292-300`,
  * SQL at `/root/reference/utilities/queries.py:6-34`, ordered by
  * `ordinal_position` at `queries.py:16`).
  *
  * In Spark the schema is metadata on the plan — no scan happens; this just
  * reifies `df.schema` as a queryable DataFrame.
  */
object Catalog {

  val outputSchema: StructType = StructType(Seq(
    StructField("column_name", StringType, nullable = false),
    StructField("data_type", StringType, nullable = false),
    StructField("ordinal_position", IntegerType, nullable = false)))

  /** Column metadata of `df` as rows, 1-based ordinal, types rendered with
    * Spark's canonical `simpleString` (e.g. `bigint`, `double`, `string`).
    */
  def describe(spark: SparkSession, df: DataFrame): DataFrame = {
    val rows = df.schema.fields.zipWithIndex.map { case (f, i) =>
      Row(f.name, f.dataType.simpleString, i + 1)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), outputSchema)
  }
}

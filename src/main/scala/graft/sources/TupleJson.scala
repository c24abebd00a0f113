package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * The reference's JSON tuple interchange format (SURVEY.md §2.1 S3/S10):
 * `{"tuples": [[s,p,o], [s,o,p,literal], ...]}` — arity 3 = triple,
 * arity 4 = edge-annotation quadruple in POSITIONAL (s, o, p, literal)
 * order (ResultsGraphBuilder.java:55-92). Kept only as the compatibility
 * boundary; internally everything is the named-column tuple DataFrame.
 */
object TupleJson {

  /** Read tuple JSON files into the engine's named tuple layout
    * (s, p, o, lit, ord, valid). Invalid arities are flagged, not thrown
    * (the Java reference throws; quarantine is the Spark-native form). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(StructField("tuples",
      ArrayType(ArrayType(StringType)))))
    spark.read.option("multiLine", true).schema(schema).json(path)
      .select(posexplode(col("tuples")).as(Seq("ord", "t")))
      .select(
        col("t").getItem(0).as("s"),
        // quad positional order is (s, o, p, lit) -> named (s, p, o, lit)
        when(size(col("t")) === 4, col("t").getItem(2))
          .otherwise(col("t").getItem(1)).as("p"),
        when(size(col("t")) === 4, col("t").getItem(1))
          .otherwise(col("t").getItem(2)).as("o"),
        when(size(col("t")) === 4, col("t").getItem(3)).as("lit"),
        col("ord").cast("long").as("ord"),
        size(col("t")).isin(3, 4).as("valid"))
  }

  /** Write a tuple DataFrame back to the interchange format: one JSON
    * object per output file part, tuples in `ord` order. */
  def write(tuples: DataFrame, path: String): Unit = {
    val arr = tuples
      .select(when(col("lit").isNotNull,
          array(col("s"), col("o"), col("p"), col("lit")))
        .otherwise(array(col("s"), col("p"), col("o"))).as("t"), col("ord"))
      .orderBy("ord")
      .agg(collect_list(col("t")).as("tuples"))
    arr.select(to_json(struct(col("tuples"))).as("value"))
      .write.mode("overwrite").text(path)
  }
}

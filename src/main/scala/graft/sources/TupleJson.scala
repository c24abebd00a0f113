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

  /** Named tuple row → positional array (quad → (s, o, p, literal)). */
  def encodeTuple: org.apache.spark.sql.Column =
    when(col("lit").isNotNull,
      array(col("s"), col("o"), col("p"), col("lit")))
      .otherwise(array(col("s"), col("p"), col("o")))

  /** Positional array → named struct(s, p, o, lit, valid). Invalid
    * arities are flagged, not thrown (the Java reference throws;
    * quarantine is the Spark-native form). */
  def decodeTuple(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    struct(
      t.getItem(0).as("s"),
      // quad positional order is (s, o, p, lit) -> named (s, p, o, lit)
      when(size(t) === 4, t.getItem(2)).otherwise(t.getItem(1)).as("p"),
      when(size(t) === 4, t.getItem(1)).otherwise(t.getItem(2)).as("o"),
      when(size(t) === 4, t.getItem(3)).as("lit"),
      size(t).isin(3, 4).as("valid"))

  /** Read tuple JSON files into the engine's named tuple layout
    * (s, p, o, lit, ord, valid). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(StructField("tuples",
      ArrayType(ArrayType(StringType)))))
    spark.read.option("multiLine", true).schema(schema).json(path)
      .select(posexplode(col("tuples")).as(Seq("ord", "t")))
      .select(decodeTuple(col("t")).as("d"), col("ord").cast("long").as("ord"))
      .select(col("d.s"), col("d.p"), col("d.o"), col("d.lit"), col("ord"),
        col("d.valid"))
  }

  /** Write a tuple DataFrame back to the interchange format: one JSON
    * object per output file part, tuples in `ord` order. */
  def write(tuples: DataFrame, path: String): Unit = {
    val arr = tuples
      .select(encodeTuple.as("t"), col("ord"))
      .orderBy("ord")
      .agg(collect_list(col("t")).as("tuples"))
    arr.select(to_json(struct(col("tuples"))).as("value"))
      .write.mode("overwrite").text(path)
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** hw1 I/O parity: TextInputFormat/TextOutputFormat ≙ tab-separated text
  * (homework-1/.../Main.java:30-31,33-35 — S1/S2 in SURVEY.md §2.1).
  */
object TsvIO {

  def read(spark: SparkSession, path: String, schema: StructType = null): DataFrame = {
    val r = spark.read.option("sep", "\t")
    (if (schema != null) r.schema(schema) else r).csv(path)
  }

  /** Tab-joined text output — the key TAB value shape of the reference's
    * reducer output (MyReduce.java:30).
    */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("sep", "\t").csv(path)
}

package graft.dsl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Serde layer (`ISerDes<T>` pairs → column transforms). */
class SerdesSpec extends SparkSpec {
  import spark.implicits._

  test("string/long/double serdes round-trip through binary columns") {
    val df = Seq(("k1", 42L, 2.5d)).toDF("s", "l", "d")
      .select(
        Serdes.stringDe(Serdes.stringSer(col("s"))).as("s"),
        Serdes.longDe(Serdes.stringSer(col("l").cast("string"))).as("l"),
        Serdes.doubleDe(Serdes.stringSer(col("d").cast("string"))).as("d"))
    assert(df.as[(String, Long, Double)].head() === (("k1", 42L, 2.5d)))
  }

  test("json serde round-trips a struct through binary") {
    val schema = StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType)))
    val df = Seq((1, "x")).toDF("a", "b")
      .select(Serdes.jsonSer(struct(col("a"), col("b"))).as("raw"))
      .select(Serdes.jsonDe(col("raw"), schema).as("v"))
      .select(col("v.a"), col("v.b"))
    assert(df.as[(Int, String)].head() === ((1, "x")))
  }

  test("avro serde columns construct against a JSON Avro schema (evaluation is a cluster concern)") {
    val avroSchema =
      """{"type":"record","name":"r","fields":[
        |{"name":"a","type":"int"},{"name":"b","type":"string"}]}""".stripMargin
    // construct-only: the spark-avro expression impl is a deploy-time dep
    val ser = Serdes.avroSer(struct(lit(1).as("a"), lit("x").as("b")))
    val de = Serdes.avroDe(col("raw"), avroSchema)
    assert(ser.toString.contains("to_avro") && de.toString.contains("from_avro"))
  }
}

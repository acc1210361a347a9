package graft.sources

import org.apache.spark.sql.types.{LongType, StringType}

import graft.SparkSpec

class DbBridgeSpec extends SparkSpec {
  import spark.implicits._

  test("string policy: everything casts to string except system ints") {
    val typed = Seq((1L, 2, 3.5, "x", Some(4)))
      .toDF("rowid", "year", "rating", "title", "__sqlmodded")
    val df = DbBridge.enforceStringPolicy(typed)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("rowid") == LongType)
    assert(types("year") == StringType)
    assert(types("rating") == StringType)
    assert(types("title") == StringType)
    val r = df.collect().head
    assert(r.getAs[String]("year") == "2")
    assert(r.getAs[Int]("__sqlmodded") == 4)
  }

  test("__sqlmodded NULL reads as 0 (tm_polars_db convention)") {
    val typed = Seq((1L, None: Option[Int])).toDF("rowid", "__sqlmodded")
    val r = DbBridge.enforceStringPolicy(typed).collect().head
    assert(r.getAs[Int]("__sqlmodded") == 0)
  }

  test("dtype overrides re-cast named columns") {
    val df = DbBridge.enforceStringPolicy(
      Seq((1L, 1999)).toDF("rowid", "year"))
    val back = DbBridge.withOverrides(df, Map("year" -> "int"))
    assert(back.schema("year").dataType.typeName == "integer")
    assert(back.collect().head.getAs[Int]("year") == 1999)
  }
}

package graft.engine

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Tripwire for driver-side fixture regeneration. Round 6 lost its whole
  * event-time query family because events.parquet silently changed
  * physical encoding mid-round; this spec pins the COLUMN/TYPE surface of
  * every fixture table so the next regeneration fails HERE, loudly, at
  * round start — not as eight scattered `_FAILED` markers mid-suite.
  *
  * Types are asserted post-`Tables.load` (the library's own contract):
  * `events.ts` must be exactly TimestampType; calendar columns
  * (o_orderdate, l_shipdate) may surface as TIMESTAMP or TIMESTAMP_NTZ
  * depending on session conf — both compare correctly against date
  * literals under the pinned UTC zone, so either satisfies the contract.
  */
class FixtureContractSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def tsLike(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  private val expected: Map[String, Seq[(String, DataType => Boolean)]] = {
    def is(t: DataType): DataType => Boolean = _ == t
    Map(
      "region" -> Seq("r_regionkey" -> is(IntegerType),
        "r_name" -> is(StringType)),
      "nation" -> Seq("n_nationkey" -> is(IntegerType),
        "n_name" -> is(StringType), "n_regionkey" -> is(IntegerType)),
      "customer" -> Seq("c_custkey" -> is(LongType),
        "c_name" -> is(StringType), "c_nationkey" -> is(IntegerType),
        "c_acctbal" -> is(DoubleType), "c_mktsegment" -> is(StringType)),
      "supplier" -> Seq("s_suppkey" -> is(LongType),
        "s_name" -> is(StringType), "s_nationkey" -> is(IntegerType),
        "s_acctbal" -> is(DoubleType)),
      "part" -> Seq("p_partkey" -> is(LongType), "p_name" -> is(StringType),
        "p_brand" -> is(StringType), "p_type" -> is(StringType),
        "p_size" -> is(IntegerType), "p_retailprice" -> is(DoubleType)),
      "orders" -> Seq("o_orderkey" -> is(LongType),
        "o_custkey" -> is(LongType), "o_orderstatus" -> is(StringType),
        "o_totalprice" -> is(DoubleType), "o_orderdate" -> tsLike _,
        "o_orderpriority" -> is(StringType)),
      "lineitem" -> Seq("l_orderkey" -> is(LongType),
        "l_partkey" -> is(LongType), "l_suppkey" -> is(LongType),
        "l_linenumber" -> is(IntegerType), "l_quantity" -> is(DoubleType),
        "l_extendedprice" -> is(DoubleType), "l_discount" -> is(DoubleType),
        "l_tax" -> is(DoubleType), "l_returnflag" -> is(StringType),
        "l_linestatus" -> is(StringType), "l_shipdate" -> tsLike _),
      "events" -> Seq("event_id" -> is(LongType),
        "ts" -> is(TimestampType), // the hard load-time contract
        "user_id" -> is(LongType), "event_type" -> is(StringType),
        "value" -> is(DoubleType), "props" -> is(StringType)),
      "documents" -> Seq("doc_id" -> is(LongType), "text" -> is(StringType),
        "lang" -> is(StringType), "source" -> is(StringType),
        "n_chars" -> is(LongType)),
      "embeddings" -> Seq("vec_id" -> is(LongType),
        "embedding" -> is(ArrayType(FloatType)),
        "label" -> is(IntegerType)))
  }

  test("every fixture table loads with the pinned column/type surface") {
    val drift = Tables.all.flatMap { name =>
      val schema = Tables.load(spark, sf, name).schema
      val got = schema.fields.map(f => f.name -> f.dataType).toMap
      expected(name).flatMap { case (colName, ok) =>
        got.get(colName) match {
          case None => Some(s"$name.$colName MISSING (fixture regenerated?)")
          case Some(dt) if !ok(dt) =>
            Some(s"$name.$colName type drifted to $dt (fixture regenerated?)")
          case _ => None
        }
      } ++ {
        val extra = got.keySet -- expected(name).map(_._1).toSet
        extra.map(c => s"$name.$c UNEXPECTED new column")
      }
    }
    assert(drift.isEmpty,
      "FIXTURE SCHEMA DRIFT — update Tables.load/queries deliberately:\n" +
        drift.mkString("\n"))
  }

  test("every fixture table is non-empty at sf0.001") {
    Tables.all.foreach { name =>
      assert(Tables.load(spark, sf, name).limit(1).count() == 1L,
        s"$name is empty")
    }
  }
}

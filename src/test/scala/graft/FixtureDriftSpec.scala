package graft

import org.apache.spark.sql.types._

/** Fixture-drift smoke: the driver regenerates /root/testdata between
  * rounds, and a physical-encoding change there (round 8: events.ts went
  * from raw TIMESTAMP(NANOS) longs to TIMESTAMP(MICROS)) broke 27 queries
  * for a whole round before anything named the cause. This spec pins the
  * POST-LOAD contract [[Tables]] guarantees to every downstream operator,
  * at every scale factor, so the next fixture regen that shifts a dtype
  * fails here first — with the fixture file in the message — instead of as
  * a pile of DATATYPE_MISMATCH analysis errors deep in query code.
  */
class FixtureDriftSpec extends SparkSpec {

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  /** Engine-facing dtype contract per table: the columns operators key on,
    * with the types the query code assumes after Tables normalization.
    * Deliberately NOT every column — string payloads may drift freely. */
  private val contract: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_totalprice" -> DoubleType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType),
    // the round-8 breakage: ts MUST land as TimestampType whatever the
    // parquet encoding — this row is the one that catches the next regen
    "events" -> Map("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  // event-time columns must load as SOME datetime type (TimestampType or
  // TIMESTAMP_NTZ both work for date-granularity logic; a drift to string
  // or epoch-long would silently change comparison semantics)
  private val datetimeCols = Map(
    "orders" -> "o_orderdate", "lineitem" -> "l_shipdate")

  for (d <- sfDirs; t <- Tables.all) {
    test(s"$d/$t.parquet loads with the contracted dtypes") {
      val schema = Tables(spark, d, t).schema
      val byName = schema.fields.map(f => f.name -> f.dataType).toMap
      contract(t).foreach { case (colName, expected) =>
        val actual = byName.get(colName)
        assert(actual.contains(expected),
          s"fixture drift in $d/$t.parquet: column '$colName' loads as " +
            s"${actual.getOrElse("<missing>")}, engine contract is " +
            s"$expected — if the driver re-encoded this column, extend " +
            s"graft.Tables normalization (see the events ts branch)")
      }
      datetimeCols.get(t).foreach { colName =>
        val actual = byName(colName)
        assert(actual == TimestampType || actual == TimestampNTZType,
          s"fixture drift in $d/$t.parquet: '$colName' loads as $actual, " +
            "expected a timestamp type")
      }
    }
  }

  // e19's XML round-trip contract: the XML element model cannot represent
  // an empty string distinctly from null, and even with
  // ignoreSurroundingSpaces=false a ws-only cell is representational
  // quicksand across readers. Pin the round-tripped string columns free of
  // empty / whitespace-padded values at every SF, so a fixture regen that
  // introduces one fails HERE with the file named, not as an e19 hash
  // mismatch.
  for (d <- sfDirs) {
    test(s"$d/events.parquet string columns are XML-round-trip safe") {
      import org.apache.spark.sql.functions.{col, trim, length}
      for (c <- Seq("event_type", "props")) {
        val bad = Tables(spark, d, "events")
          .filter(col(c).isNull || length(col(c)) === 0 ||
            trim(col(c)) =!= col(c)).count()
        assert(bad === 0L,
          s"fixture drift in $d/events.parquet: $bad rows of '$c' are " +
            "null/empty/whitespace-padded — e19's XML round-trip cannot " +
            "carry these losslessly; quarantine them engine-side first")
      }
    }
  }
}

package graft

import graft.operators.Skew
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Salted plans must be result-identical to their unsalted twins. */
class SkewSpec extends SparkSpecBase {

  test("saltedJoin equals the plain join") {
    val l = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"))
    val plain = l.join(o, Seq("l_orderkey"))
    val salted = Skew.saltedJoin(l, o, "l_orderkey", salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.agg(sum(col("l_quantity"))).head().getDouble(0) ==
      plain.agg(sum(col("l_quantity"))).head().getDouble(0))
  }

  test("saltedSum equals the plain aggregation") {
    val e = Tables.events(spark, sfDir).withColumn("v", floor(col("value") * 100).cast("long"))
    val plain = e.groupBy(col("event_type"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedSum(e, "event_type", "v", salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }
}

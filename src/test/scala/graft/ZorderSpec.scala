package graft

import org.apache.spark.sql.functions._

/** Z-order layout properties beyond the value oracle: the interleave
  * is a bijection, and fixing a zkey prefix confines BOTH dimensions —
  * the locality that buys two-dimensional min/max pruning from one
  * physical sort order. */
class ZorderSpec extends SparkSpecBase {

  test("zorder interleave matches the direct bit spelling row-for-row") {
    val rows = SparkEntry.queries("op_zorder_cluster")(spark, sfDir).collect()
    def morton(bx: Long, by: Long): Long =
      (0 until 8).map(i => (((bx >> i) & 1L) << (2 * i + 1)) | (((by >> i) & 1L) << (2 * i))).sum
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) == morton(r.getLong(1), r.getLong(2)),
      s"event ${r.getLong(0)}: zkey ${r.getLong(3)} != morton(${r.getLong(1)}, ${r.getLong(2)})"))
  }

  test("zkey bijects with (bx, by) and a zkey prefix bounds both dimensions") {
    val got = SparkEntry.queries("op_zorder_cluster")(spark, TestSession.sfDir01).cache()
    val collisions = got.select(col("bx"), col("by"), col("zkey")).distinct()
      .groupBy(col("zkey")).count().filter(col("count") > 1).count()
    assert(collisions == 0, "two (bx, by) cells mapped to one zkey")
    // top 8 zkey bits = top 4 bits of each dim → within a 256-key
    // prefix range each dimension spans at most a 16-wide band. This
    // is the pruning property: a file covering one prefix range serves
    // min/max filters on user AND day.
    val loose = got.groupBy(expr("zkey DIV 256"))
      .agg((max(col("bx")) - min(col("bx"))).as("rx"),
        (max(col("by")) - min(col("by"))).as("ry"))
      .filter(col("rx") > 15 || col("ry") > 15)
      .count()
    assert(loose == 0, s"$loose zkey prefix ranges spill a 16-wide dimension band")
    got.unpersist()
  }
}

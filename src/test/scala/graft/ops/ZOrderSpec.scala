package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** e13 property specs: the Z-ordered layout must keep per-file min/max
  * bounds tight on BOTH dims at once — measured as actual file skipping
  * for a box query on the dimension a single-column sort cannot prune. */
class ZOrderSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  /** Per-file (min, max) stats of both dims, keyed by file name. */
  private def fileBounds(df: DataFrame): Seq[(Long, Long, Long, Long)] =
    df.withColumn("f", input_file_name())
      .groupBy(col("f"))
      .agg(min(col("l_partkey")).as("pmin"), max(col("l_partkey")).as("pmax"),
        min(col("l_suppkey")).as("smin"), max(col("l_suppkey")).as("smax"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

  test("zValue interleaves bits: unit squares map to contiguous quads") {
    val s = spark
    import s.implicits._
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 0L), (0L, 2L), (3L, 3L))
      .toDF("x", "y")
    val got = pts.select(col("x"), col("y"),
        ExportOps.zValue(col("x"), col("y"), 8).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got((0L, 0L)) == 0L)
    assert(got((1L, 0L)) == 1L)
    assert(got((0L, 1L)) == 2L)
    assert(got((1L, 1L)) == 3L)
    assert(got((2L, 0L)) == 4L)
    assert(got((0L, 2L)) == 8L)
    assert(got((3L, 3L)) == 15L)
  }

  test("z-order files prune a suppkey box the partkey-sorted layout cannot") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_zspec").toFile
    try {
      val zDir = new java.io.File(dir, "z").getAbsolutePath
      val linDir = new java.io.File(dir, "lin").getAbsolutePath
      ExportOps.zorderExport(s, d, zDir)
      // control: the e08 discipline applied to partkey only — perfect
      // pruning on partkey, none on suppkey
      Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"))
        .repartitionByRange(16, col("l_partkey"), col("l_orderkey"),
          col("l_linenumber"))
        .sortWithinPartitions(col("l_partkey"), col("l_orderkey"),
          col("l_linenumber"))
        .write.parquet(linDir)

      val zB = fileBounds(s.read.parquet(zDir))
      val linB = fileBounds(s.read.parquet(linDir))
      assert(zB.size >= 8 && linB.size >= 8, s"${zB.size} / ${linB.size} files")

      // box query on suppkey alone: the bottom quarter of its range
      val (sMin, sMax) = (zB.map(_._3).min, zB.map(_._4).max)
      val cut = sMin + (sMax - sMin) / 4
      def touched(b: Seq[(Long, Long, Long, Long)]) =
        b.count { case (_, _, lo, hi) => lo <= cut && hi >= sMin }
      val zTouched = touched(zB)
      val linTouched = touched(linB)
      // the partkey sort spreads every suppkey through every file; the
      // Z curve confines the box to a minority of files
      assert(linTouched == linB.size,
        s"control layout unexpectedly prunes: $linTouched/${linB.size}")
      assert(zTouched * 2 <= linTouched,
        s"z-order pruning too weak: $zTouched/${zB.size} vs control $linTouched")

      // and the curve costs nothing on content (the gate hashes this too)
      val back = s.read.parquet(zDir)
      assert(back.count() == Tables(s, d, "lineitem").count())
    } finally ExportOps.deleteRecursively(dir)
  }
}

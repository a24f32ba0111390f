package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` / `array<double>` columns, built from
  * codegen'd Catalyst builtins (`zip_with` + `aggregate`) rather than Scala
  * UDFs, so the expressions stay inside whole-stage codegen and survive
  * column pruning / predicate pushdown analysis.
  *
  * Used by the similarity-search operators (SURVEY.md §2.6) over
  * `embeddings.embedding` (64-dim float vectors).
  */
object VectorFunctions {

  /** Cast an array<float> column to array<double> for stable accumulation. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product of two numeric array columns (accumulates in double,
    * sequential left fold — deterministic order of addition). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val ad = toDouble(a)
    val bd = toDouble(b)
    val denom = l2Norm(ad) * l2Norm(bd)
    when(denom === 0.0, lit(0.0)).otherwise(dot(ad, bd) / denom)
  }

  /** Squared euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Sign-bit signature against `planes` fixed hyperplanes: bit i is set when
    * dot(v, plane_i) >= 0. Deterministic planes are derived from the seed via
    * a splitmix64-style integer mix (no RNG state, stable across JVMs).
    * Used to bucket vectors for LSH-based approximate nearest neighbours:
    * two vectors with high cosine similarity agree on most sign bits, so
    * grouping by (or prefix-matching on) the signature turns an O(n^2)
    * all-pairs cosine into a per-bucket join — the 100 TB scale path.
    */
  def hyperplaneSignature(v: Column, planes: Int = 16, dim: Int = 64,
                          seed: Long = 42L): Column = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val vd = toDouble(v)
    val bits: Seq[Column] = (0 until planes).map { i =>
      // plane_i[j] = ±1, derived from mix(seed, i, j)
      val plane = (0 until dim).map { j =>
        if (mix(seed * 0x100000001B3L + i * 8191L + j) < 0) -1.0 else 1.0
      }
      val planeCol = typedLit(plane)
      val d = dot(vd, planeCol)
      when(d >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _).as("hp_signature")
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ArrayType` columns via higher-order functions —
  * codegen-friendly, no UDF serialization, deterministic left-to-right
  * folds (bitwise-reproducible across engines for oracle checks).
  */
object VectorFns {

  /** Cast `array<float>` to `array<double>` so all arithmetic happens in
    * double (embedding parquet stores float32). */
  def toDoubleVec(c: Column): Column = c.cast("array<double>")

  /** Sequential left-fold dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 for zero-norm inputs. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Sign-bit LSH bucket over the first `nBits` dimensions: a deterministic
    * coordinate-hyperplane bucketing (bit i set iff v[i] > 0). Turns ANN
    * search from a cross join into an equi join on the bucket id — the
    * scale path for 100 TB corpora. Recall/probing tradeoff is the
    * caller's via `nBits`. */
  def signBucket(v: Column, nBits: Int): Column =
    (0 until nBits).map { i =>
      when(element_at(v, i + 1) > 0.0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
}

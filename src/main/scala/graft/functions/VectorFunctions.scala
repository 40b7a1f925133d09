package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column algebra over `array<float>` / `array<double>`
  * embedding columns (SURVEY.md §7.5 similarity search).
  *
  * All higher-order-function expressions — distributed and
  * codegen-compatible, no UDFs. Elements are cast to double *before*
  * multiplication so precision does not depend on the stored width.
  */
object VectorFunctions {

  /** Elementwise cast to double. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product in double precision — compiled kernel
    * (graft.functions.expressions.TextExpressions.DotProductExpr);
    * same left-to-right summation order as the zip_with fold.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.expressions.TextExpressions.dot_product(a, b)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Squared L2 distance. */
  def l2Dist2(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity; 0 for a zero vector — compiled kernel. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.expressions.TextExpressions.cosine_sim(a, b)

  /** Sign bit of the projection onto a constant hyperplane — building
    * block for random-hyperplane LSH (deterministic: planes are fixed
    * seeded constants supplied by the caller).
    */
  def projectionBit(v: Column, plane: Seq[Double]): Column = {
    val planeCol = array(plane.map(lit): _*)
    (dot(v, planeCol) >= 0).cast("int")
  }

  /** Pack `planes.length` projection bits into one bucket id. */
  def lshBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      projectionBit(v, p) * lit(1L << i)
    }.reduce(_ + _)
}

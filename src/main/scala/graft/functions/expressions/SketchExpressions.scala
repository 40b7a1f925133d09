package graft.functions.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Serialized sketch bytes shipped as a BROADCAST variable with
  * VALUE-based equality (md5 of the serialized form):
  *
  *   - broadcast, not an expression field: a multi-MB sketch embedded
  *     in the expression tree rides the task binary of every stage
  *     that references it (the `Broadcasting large task binary`
  *     warning); a broadcast ships once per executor and the task
  *     binary carries only this handle.
  *   - md5 equality, not Array[Byte] reference identity: equal-content
  *     probes must compare equal for canonicalization/semanticEquals/
  *     subexpression reuse, and equals must not byte-walk megabytes
  *     every time the optimizer compares nodes.
  */
final class SketchPayload private (
    val bc: Broadcast[Array[Byte]], val md5Hex: String) extends Serializable {
  override def equals(o: Any): Boolean = o match {
    case p: SketchPayload => p.md5Hex == md5Hex
    case _ => false
  }
  override def hashCode: Int = md5Hex.hashCode
  override def toString: String = s"SketchPayload($md5Hex)"
}

object SketchPayload {
  def apply(bytes: Array[Byte]): SketchPayload = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
    val sc = org.apache.spark.sql.SparkSession.active.sparkContext
    new SketchPayload(sc.broadcast(bytes), hex)
  }
}

/** Sketch-probe kernels: per-row membership / frequency probes against
  * a driver-built sketch, shipped to executors as a broadcast of the
  * serialized bytes (no UDF, no closure-captured live object, nothing
  * sketch-sized in the task binary). Each task deserializes the sketch
  * ONCE (transient lazy) and then probes it per row in compiled Scala.
  *
  * These exist for the runtime-filter pattern (SURVEY §7.5): an exact
  * operator uses the sketch only to PRUNE — bloom false positives and
  * count-min overestimates are removed by an exact join / exact
  * re-count downstream, so the composed result is bit-identical to
  * the sketch-free form while the sketch eliminates the bulk of the
  * shuffle volume.
  */
object SketchExpressions {

  /** `bloom.mightContain(child)` for a LongType child. False positives
    * allowed (rate = the build fpp), false negatives impossible — the
    * contract the pruning pattern relies on.
    */
  case class BloomMightContainLong(child: Expression, payload: SketchPayload)
      extends UnaryExpression with CodegenFallback {
    @transient private lazy val bloom: BloomFilter =
      BloomFilter.readFrom(new ByteArrayInputStream(payload.bc.value))
    override def dataType: DataType = BooleanType
    override def nullSafeEval(input: Any): Any =
      bloom.mightContainLong(input.asInstanceOf[Long])
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** `cms.estimateCount(child)` for a LongType child. Never
    * underestimates the true count (CMS takes the MIN over d counters
    * that each upper-bound the truth), which makes `estimate >= T` a
    * sound prefilter for `trueCount >= T`.
    */
  case class CmsEstimateLong(child: Expression, payload: SketchPayload)
      extends UnaryExpression with CodegenFallback {
    @transient private lazy val cms: CountMinSketch =
      CountMinSketch.readFrom(new ByteArrayInputStream(payload.bc.value))
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      cms.estimateCount(input.asInstanceOf[Long])
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  // both builders widen the probe column to long at the API boundary:
  // the kernels unbox Long, and an int32 key column must not
  // ClassCastException at runtime (integral→long is value-preserving,
  // and Spark's own sketch builders hash all integrals via longValue,
  // so the probe stays consistent with the build)
  def bloomMightContain(c: Column, bloom: BloomFilter): Column = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    ColumnBridge.column(BloomMightContainLong(
      ColumnBridge.expression(c.cast("long")), SketchPayload(out.toByteArray)))
  }

  def cmsEstimate(c: Column, cms: CountMinSketch): Column = {
    val out = new java.io.ByteArrayOutputStream()
    cms.writeTo(out)
    ColumnBridge.column(CmsEstimateLong(
      ColumnBridge.expression(c.cast("long")), SketchPayload(out.toByteArray)))
  }
}

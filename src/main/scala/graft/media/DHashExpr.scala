package graft.media

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.graftbridge.Bridge.{ADT => AbstractDataType}
import org.apache.spark.sql.types._

/** Difference hash (dHash) — the standard first-line perceptual image
  * fingerprint: over a 9 x 8 grayscale raster, bit (y*8 + x) is set
  * iff the pixel right of (x, y) is strictly brighter. Gradient signs
  * survive what re-encoding does to absolute pixel values (quantization
  * noise, gamma-ish shifts), so copies land within a few Hamming bits
  * and the banded join ([[graft.analysis.TextOps.bandedHammingPairs]])
  * finds them without an all-pairs compare.
  *
  * Input contract: a row-major array<int> raster of EXACTLY 72
  * elements (width 9, height 8) with 0-255 values — what
  * [[BinaryOps.sampleGrayFrames]] emits from the codec seam; any real
  * codec's 9x8 grayscale thumbnail plugs in unchanged. A wrong-length
  * raster is a caller bug and fails fast. Fused: one compiled pass,
  * real `doGenCode` calling the public `evalCore` (the raster stays
  * inside whole-stage codegen).
  */
case class DHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def prettyName: String = "dhash64"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("dhash64", this)
      s"${ev.value} = $ref.evalCore($c);"
    })

  override def nullSafeEval(arr: Any): Any =
    evalCore(arr.asInstanceOf[ArrayData])

  /** Shared by interpreted eval and generated code (public for janino). */
  def evalCore(gray: ArrayData): Long = {
    if (gray.numElements() != 72) {
      throw new IllegalArgumentException(
        s"dhash64 expects a 9x8 raster (72 ints), got ${gray.numElements()}")
    }
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (gray.getInt(y * 9 + x + 1) > gray.getInt(y * 9 + x)) {
          h |= 1L << (y * 8 + x)
        }
        x += 1
      }
      y += 1
    }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DHash64 {
  def of(gray: Column): Column =
    Bridge.column(DHash64(Bridge.expression(gray)))
}

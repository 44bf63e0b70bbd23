package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `deflate_size(string) -> bigint`: byte length of the input's raw-DEFLATE
 * stream at a fixed level — the compression-ratio quality signal used by
 * large-corpus curation (highly repetitive text compresses far below
 * natural prose; cf. the repetition heuristics in Rae et al. 2021 "Gopher"
 * §A.1.1 and RefinedWeb). Ratio = deflate_size/byte-length: natural text
 * lands ~0.4–0.7, boilerplate/spam collapses toward 0, already-compressed
 * or random content pushes past 1.
 *
 * Native `doGenCode` expression (static call, stays in whole-stage
 * codegen); the `Deflater` is thread-local and reset per value, so the
 * zlib native handle is allocated once per task thread, not per row — the
 * per-row cost is one deflate pass over the document bytes.
 *
 * DETERMINISM SCOPE: output is a function of the JVM's bundled zlib, so
 * it is stable within a run and across runs on one JVM but NOT a
 * cross-engine contract (DuckDB cannot reproduce it) — gates over this
 * signal are rows-only with an oracle-green twin asserting the
 * compression-monotonicity properties (see q_quality_compress_twins).
 */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_size"

  override protected def nullSafeEval(input: Any): Any =
    DeflateSize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateSize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object DeflateSize {

  // One zlib handle per task thread, reset per value. Level 6 (zlib
  // default), nowrap (raw stream, no 2-byte header + 4-byte checksum —
  // the signal is the entropy estimate, not a container format).
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }

  /** Static helper referenced from generated Java code. */
  def compute(s: UTF8String): Long = {
    val d = local.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

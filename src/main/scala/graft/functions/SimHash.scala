package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of whitespace-tokenized text (Charikar 2002): each token is
  * hashed (FNV-1a 64); per bit, +1 if set else -1, summed over tokens; the
  * fingerprint has bit i set iff the sum is positive. Near-duplicate documents
  * have fingerprints within a small Hamming distance.
  *
  * Implemented as a native Catalyst expression with `doGenCode` (whole-stage
  * codegen emits a static call — no UDF deserialization on the hot path).
  */
object SimHash {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime  = 0x100000001b3L

  def fnv1a(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = FnvOffset
    var i = from
    while (i < until) { h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1 }
    h
  }

  /** Static entry point used by both eval and generated code. */
  def hash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    val counts = new Array[Int](64)
    var i = 0
    var tokStart = -1
    def flush(end: Int): Unit = if (tokStart >= 0) {
      val h = fnv1a(bytes, tokStart, end)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      tokStart = -1
    }
    while (i < bytes.length) {
      val c = bytes(i)
      val ws = c == ' ' || c == '\n' || c == '\t' || c == '\r'
      if (ws) flush(i) else if (tokStart < 0) tokStart = i
      i += 1
    }
    flush(bytes.length)
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def simhash64(c: Column): Column = Bridge.column(SimHash64(Bridge.expression(c)))

  def hammingDist(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.bit_count
    bit_count(a.bitwiseXOR(b))
  }
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SimHash.hash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.hash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Cross-engine 60-bit hash: the first 15 hex chars of md5, as a positive
  * long. Computable identically in Spark (`conv(substr(md5(x),1,15),16,10)`),
  * DuckDB (`CAST('0x' || substr(md5(x),1,15) AS BIGINT)`), and the JVM — the
  * single hash the oracle-checked signature operators (minhash, simhash,
  * winnowing) are built on. 60 bits keeps every value positive and exactly
  * representable in both engines' BIGINT; at web scale you would swap in
  * xxhash64 (same plan shape, cheaper hash) and lose only the DuckDB replay.
  */
object OracleHash {
  /** Column form (codegen'd builtins only — usable inside lambdas). */
  def hash60(c: Column): Column = {
    import org.apache.spark.sql.functions._
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
  }

  /** DuckDB SQL text of the same hash over an expression. */
  def hash60Sql(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** JVM form over UTF-8 bytes: first 8 md5 bytes big-endian, >>> 4
    * (= value of the first 15 hex chars).
    */
  def hash60(s: String): Long = hash60(s.getBytes("UTF-8"))

  def hash60(bytes: Array[Byte]): Long = {
    var v = 0L
    val h = md5Bytes(bytes)
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Raw md5 digest (shared ThreadLocal instance). */
  def md5Bytes(bytes: Array[Byte]): Array[Byte] = {
    val d = md.get()
    d.reset()
    d.digest(bytes)
  }

  /** md5 hex — matches Spark `md5()` and DuckDB `md5()`. */
  def md5Hex(bytes: Array[Byte]): String =
    md5Bytes(bytes).map(b => f"$b%02x").mkString
}

/** Distinct word-k-gram shingle hashes in ONE native pass: tokenize on
  * whitespace, hash each k-token gram (joined by a single space), dedupe.
  * The declarative `transform(sequence(...), i -> hash(concat_ws(slice(...))))`
  * form re-evaluates the token `split()` once per array ELEMENT (Catalyst
  * does no CSE inside higher-order-function lambdas, and CollapseProject
  * inlines any pre-split projection right back) — measured 8-10 s per pass
  * over 5 000 docs vs ~0.1 s for this expression.
  *
  * `useHash60 = true` hashes with [[OracleHash.hash60]] (DuckDB-replayable:
  * `md5(array_to_string(t[i+1:i+k], ' '))` prefix); `false` uses FNV-1a 64
  * (production: no MessageDigest cost, loses only the oracle replay).
  */
object ShingleHashes {
  // exactly RE2's \s = [\t\n\f\r ]: the DuckDB oracle splits with RE2 '\s+';
  // Java's \s additionally matches vertical tab \x0B, which would diverge
  private val Ws = java.util.regex.Pattern.compile("[ \\t\\n\\f\\r]+")

  def shingles(text: UTF8String, k: Int, useHash60: Boolean): ArrayData = {
    // replicate SQL semantics exactly: trim strips ASCII spaces ONLY (Java
    // String.trim also eats control chars), split keeps trailing empties
    // (limit -1, like Spark's split / DuckDB's regexp_split_to_array)
    val s = text.toString
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    val toks = Ws.split(s.substring(b, e), -1)
    if (toks.length < k) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + k <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
      val bytes = sb.toString.getBytes("UTF-8")
      val h =
        if (useHash60) OracleHash.hash60(bytes)
        else SimHash.fnv1a(bytes, 0, bytes.length)
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  def apply(text: Column, k: Int, useHash60: Boolean): Column =
    Bridge.column(ShingleHashesExpr(Bridge.expression(text), k, useHash60))
}

case class ShingleHashesExpr(child: Expression, k: Int, useHash60: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    ShingleHashes.shingles(v.asInstanceOf[UTF8String], k, useHash60)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashes.shingles($c, $k, $useHash60)")
  override protected def withNewChildInternal(c: Expression): ShingleHashesExpr =
    copy(child = c)
}

/** MinHash signature in ONE pass over the shingle array: per permutation j,
  * `min over shingles h of (a_j * (h mod p) + b_j) mod p`. Replaces 64
  * separate `array_min(transform(...))` columns (an expression-tree/codegen
  * blowup the round-1 bench measured at 27 s for 500 docs) with a native
  * codegen'd expression — one loop, no intermediate arrays.
  */
object MinHashSig {
  def sig(sh: ArrayData, a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val k = a.length
    val m = new Array[Long](k)
    java.util.Arrays.fill(m, Long.MaxValue)
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      val h = sh.getLong(i) % p
      var j = 0
      while (j < k) {
        val v = (a(j) * h + b(j)) % p // a,h < p = 2^31-1 → product < 2^62
        if (v < m(j)) m(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(m)
  }

  def apply(shingles: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    Bridge.column(MinHashSigExpr(Bridge.expression(shingles), a, b, p))
}

case class MinHashSigExpr(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression {
  require(a.length == b.length, "permutation coefficient arrays must align")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val aArr = a.toArray
  @transient private lazy val bArr = b.toArray

  override protected def nullSafeEval(v: Any): Any =
    MinHashSig.sig(v.asInstanceOf[ArrayData], aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.sig($c, $aRef, $bRef, ${p}L)")
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigExpr = copy(child = c)
}

/** Random-hyperplane LSH band pieces in ONE pass: the embedding is quantized
  * (`round(v*1000)`, the engine-wide integer domain), dotted with every
  * hyperplane, and the sign bits are packed `rowsPerBand` per band:
  * `piece[band] = Σ_j (dot(plane[band*rpb+j]) >= 0) << j`. Replaces the
  * 16-plane `aggregate(zip_with(...))` chain (33.6 s for 100 vectors in the
  * round-1 bench — pure expression-tree overhead) and scales to hundreds of
  * planes (the 16-bit-band near-dup scheme) at ~dim·planes multiplies/row.
  */
object HyperplaneBands {
  def pieces(emb: ArrayData, planes: Array[Long], dim: Int, rowsPerBand: Int,
             floats: Boolean): ArrayData = {
    val n = emb.numElements()
    require(n == dim, s"embedding dim $n != expected $dim")
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      require(!emb.isNullAt(i),
        s"null element at $i: embedding vectors must be dense (containsNull=false)")
      val v = if (floats) emb.getFloat(i).toDouble else emb.getDouble(i)
      q(i) = QuantizedDot.q(v * 1000.0)
      i += 1
    }
    val numPlanes = planes.length / dim
    val out = new Array[Long](numPlanes / rowsPerBand)
    var pl = 0
    while (pl < numPlanes) {
      var dot = 0L
      var j = 0
      val base = pl * dim
      while (j < dim) { dot += q(j) * planes(base + j); j += 1 }
      if (dot >= 0) out(pl / rowsPerBand) |= 1L << (pl % rowsPerBand)
      pl += 1
    }
    new GenericArrayData(out)
  }

  def apply(emb: Column, planes: Seq[Long], dim: Int, rowsPerBand: Int): Column =
    Bridge.column(HyperplaneBandsExpr(Bridge.expression(emb), planes, dim, rowsPerBand))
}

case class HyperplaneBandsExpr(child: Expression, planes: Seq[Long], dim: Int,
                               rowsPerBand: Int) extends UnaryExpression {
  require(planes.length % dim == 0, "planes must be a whole number of rows")
  require((planes.length / dim) % rowsPerBand == 0, "planes must fill whole bands")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val planesArr = planes.toArray

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(v: Any): Any =
    HyperplaneBands.pieces(v.asInstanceOf[ArrayData], planesArr, dim, rowsPerBand, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("hpPlanes", planesArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneBands.pieces($c, $pRef, $dim, $rowsPerBand, $isFloat)")
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneBandsExpr =
    copy(child = c)
}

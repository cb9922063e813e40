package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst kernels for the dedup / similarity operators — single-pass
  * per-row evaluation over `ArrayData` with zero boxing and zero Scala-UDF
  * dispatch. Each replaces what would otherwise be a chain of 64+ higher-order
  * function expressions (e.g. one `transform`+`array_min` pair per MinHash
  * permutation), which is the difference between O(shingles) and
  * O(shingles × permutations) array traversals per document.
  */

/** 64-permutation MinHash signature of a shingle set (array<string>).
  * sig[j] = min over shingles of murmur3_32(shingle, seed_j), as unsigned.
  * The classic shingle→minhash construction; one pass over the shingles
  * computes all permutations. Empty input yields the all-MaxValue signature
  * (bucket hashes then never collide with real documents).
  */
case class MinHashSignature(child: Expression, numPerms: Int = 64)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      var j = 0
      while (j < numPerms) {
        val h = Murmur3_x86_32.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, j * 0x9E3779B9 + 0x5BD1) & 0xFFFFFFFFL
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

/** MinHash LSH band hashes, fused: computes the `numPerms`-permutation
  * MinHash signature (as [[MinHashSignature]]) and folds each consecutive
  * `numPerms / bands` signature values into one 64-bit band hash, all in a
  * single pass over the shingles. Emitting band hashes directly matters for
  * plan shape: banding a separately-projected signature with a higher-order
  * `transform` re-evaluates the signature expression once per band after
  * `CollapseProject` inlines it (16× the work at 16 bands); this kernel is
  * evaluated exactly once per row however the projection collapses.
  */
case class MinHashBands(child: Expression, numPerms: Int = 64, bands: Int = 16)
    extends UnaryExpression with CodegenFallback {
  private val rows = numPerms / bands
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      var j = 0
      while (j < numPerms) {
        val h = Murmur3_x86_32.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, j * 0x9E3779B9 + 0x5BD1) & 0xFFFFFFFFL
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 1125899906842597L // FNV-ish fold of the band's signature run
      var r = 0
      while (r < rows) { acc = acc * 31 + mins(b * rows + r); r += 1 }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): MinHashBands = copy(child = c)
}

/** SimHash chunk values for pigeonhole banding, fused for the same plan-shape
  * reason as [[MinHashBands]]: emits the `chunks` equal-width bit slices of
  * the 64-bit SimHash as an array, computing the hash once per row. The full
  * hash is recoverable from the chunks (they partition the 64 bits), so the
  * caller can also reconstruct Hamming distances chunk-wise.
  */
case class SimHashChunks(child: Expression, chunks: Int = 8)
    extends UnaryExpression with CodegenFallback {
  private val width = 64 / chunks
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      val h1 = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0x12345678)
      val h2 = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0x0FEDCBA9)
      val h = (h1.toLong << 32) | (h2.toLong & 0xFFFFFFFFL)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sim |= (1L << b); b += 1 }
    val out = new Array[Long](chunks)
    var c = 0
    while (c < chunks) { out(c) = (sim >>> (c * width)) & ((1L << width) - 1); c += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): SimHashChunks = copy(child = c)
}

/** Distinct word n-gram shingles of a text column, in one pass: lowercase,
  * split into ASCII-letter runs, join each n consecutive tokens with single
  * spaces. Semantics mirror the SQL form
  * `list_distinct(list_transform(generate_series(1, greatest(n_tok-(n-1),1)),
  *   i -> coalesce(w[i],'') || ' ' || ... ))` — i.e. documents with fewer
  * than n tokens yield one shingle padded with empty strings. Replaces a
  * regexp + 3×try_element_at + concat + array_distinct higher-order chain
  * that cost ~3 ms/doc; this is a single byte scan.
  */
case class WordShingles(child: Expression, n: Int = 3)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString.toLowerCase
    val tokens = new scala.collection.mutable.ArrayBuffer[String](64)
    var i = 0
    val len = s.length
    while (i < len) {
      val c = s.charAt(i)
      if (c >= 'a' && c <= 'z') {
        val start = i
        while (i < len && { val d = s.charAt(i); d >= 'a' && d <= 'z' }) i += 1
        tokens += s.substring(start, i)
      } else i += 1
    }
    val count = math.max(tokens.length - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[String]()
    var j = 0
    while (j < count) {
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        if (j + k < tokens.length) sb.append(tokens(j + k))
        k += 1
      }
      seen.add(sb.toString)
      j += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = UTF8String.fromString(it.next()); m += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

/** 64-bit SimHash over a token array: per-token 64-bit hash (two murmur32
  * lanes), per-bit majority vote. Near-dup docs differ in few bits; pairs
  * within Hamming distance k are found exactly by banding the 64 bits into
  * k+1 chunks (pigeonhole: k flips cannot touch all k+1 chunks).
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      val h1 = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0x12345678)
      val h2 = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0x0FEDCBA9)
      val h = (h1.toLong << 32) | (h2.toLong & 0xFFFFFFFFL)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** Polynomial (Horner) rolling hash of an ASCII string:
  * h = Σ byte_i · base^(n-1-i) mod `mod`. Content-defined fingerprinting
  * primitive; parameters chosen so a SQL reimplementation (powers via
  * `pow`, single final mod) matches exactly for short inputs.
  */
case class RollingHash(child: Expression, base: Long = 31L, mod: Long = 1000000007L)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    var h = 0L
    var i = 0
    val n = s.numBytes
    while (i < n) {
      h = (h * base + (s.getByte(i) & 0xFF)) % mod
      i += 1
    }
    java.lang.Long.valueOf(h)
  }
  override protected def withNewChildInternal(c: Expression): RollingHash = copy(child = c)
}

/** Sign-random-projection LSH bucket of an embedding (array<float|double>):
  * bit j = sign(v · r_j) with Rademacher ±1 hyperplanes derived from
  * murmur3(seed, j·8192 + i). `numBits` bits pack into an int bucket id —
  * cosine-similar vectors collide with high probability.
  */
case class SignRandomProjection(child: Expression, numBits: Int = 16, seed: Int = 77)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  private def elemAt(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var bucket = 0
    var j = 0
    while (j < numBits) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val sign = if ((Murmur3_x86_32.hashInt(j * 8192 + i, seed) & 1) == 1) 1.0 else -1.0
        acc += sign * elemAt(arr, i, isFloat)
        i += 1
      }
      if (acc >= 0) bucket |= (1 << j)
      j += 1
    }
    java.lang.Integer.valueOf(bucket)
  }
  override protected def withNewChildInternal(c: Expression): SignRandomProjection = copy(child = c)
}

/** Cosine similarity of two equal-length numeric arrays, computed in double
  * in one fused pass (dot and both norms together). Zero-norm inputs yield
  * 0.0. Used on the ANN hot path: one expression eval per candidate pair.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  private def isFloat(e: Expression) = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  private lazy val lf = isFloat(left)
  private lazy val rf = isFloat(right)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    java.lang.Double.valueOf(if (denom == 0.0) 0.0 else dot / denom)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable k-means centroid accumulator: per-cluster element-wise sums of
  * floor-quantized vector components (BIGINT, 2^-20 units) plus counts —
  * the x11 Lloyd-round recompute as ONE bounded buffer instead of the
  * posexplode → groupBy(cluster, pos) → groupBy(cluster) → collect chain
  * (k·dim longs per partition versus n·dim exploded rows through two
  * exchanges; the chain was 3 of x11's 7 stages).
  *
  * Determinism contract (must stay bit-identical to the SQL/DuckDB twin in
  * Similarity.kmeansSummarySql): each component contributes
  * `floor(val * 1048576.0)` as a BIGINT — integer sums are associative, so
  * partitioning and merge order cannot change them — and the centroid mean
  * is `(sum / 1048576.0) / count` in exactly that division order.
  */
final class CentroidBuffer(val k: Int) {
  var dim: Int = -1
  var sums: Array[Long] = _
  val counts: Array[Long] = new Array[Long](k)

  def add(cluster: Int, e: ArrayData): Unit = {
    if (dim < 0) { dim = e.numElements(); sums = new Array[Long](k * dim) }
    // A ragged vector must fail LOUDLY: an aggregate cannot return the
    // per-row null the scalar kernels (VecOps.d2F/dotF) use for length
    // mismatches, and silently truncating/overreading would corrupt every
    // centroid that partition touches.
    require(e.numElements() == dim,
      s"graft_centroids: vector of dim ${e.numElements()} in a dim-$dim corpus")
    val base = cluster * dim
    var i = 0
    while (i < dim) {
      val q = math.floor(e.getDouble(i) * 1048576.0)
      // `.toLong` on a double SATURATES at Long.MaxValue silently, while
      // the DuckDB twin's CAST(floor(...) AS BIGINT) raises — a garbage
      // component (|v| ≳ 8.8e12) would diverge the engines instead of
      // failing both. Bound the quantized magnitude at 2^62 (headroom for
      // the subsequent cross-row summing) so bad inputs fail loudly here.
      require(math.abs(q) <= 4.611686018427388e18,
        s"graft_centroids: component ${e.getDouble(i)} overflows the " +
          "2^-20 quantization (|v| must stay below ~4.4e12)")
      // addExact: the CROSS-ROW accumulation can still wrap even when
      // every element passes the per-element bound (three ~4e12
      // components in one cluster exceed 2^63); the DuckDB twin's
      // SUM(BIGINT) raises there, so the engine must too.
      sums(base + i) = Math.addExact(sums(base + i), q.toLong)
      i += 1
    }
    counts(cluster) += 1
  }

  def merge(other: CentroidBuffer): Unit = {
    if (other.dim < 0) return
    if (dim < 0) { dim = other.dim; sums = new Array[Long](k * dim) }
    require(other.dim == dim,
      s"graft_centroids: merging dim-${other.dim} buffer into dim-$dim")
    var i = 0
    while (i < sums.length) {
      sums(i) = Math.addExact(sums(i), other.sums(i)); i += 1
    }
    i = 0
    while (i < k) { counts(i) += other.counts(i); i += 1 }
  }
}

/** `graft_centroids(cluster, vec, k)` — returns the sorted
  * array<struct<cluster INT, cvec ARRAY<DOUBLE>>> centroid table (empty
  * clusters omitted), ready to broadcast for the next assignment pass.
  * `k` is a plan-time literal: it sizes the fixed buffer.
  */
case class CentroidSumAgg(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CentroidBuffer]
  with BinaryLike[Expression] {

  require(k >= 1 && k <= 65536, s"graft_centroids k=$k out of range")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_centroids expects (int, array<double>), got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("cvec", ArrayType(DoubleType, containsNull = false),
      nullable = false))), containsNull = false)
  override def prettyName: String = "graft_centroids"

  override def createAggregationBuffer(): CentroidBuffer = new CentroidBuffer(k)

  override def update(buffer: CentroidBuffer, input: InternalRow): CentroidBuffer = {
    val c = left.eval(input)
    val e = right.eval(input)
    if (c != null && e != null) {
      val cl = c.asInstanceOf[Int]
      require(cl >= 0 && cl < k, s"cluster id $cl outside [0, $k)")
      buffer.add(cl, e.asInstanceOf[ArrayData])
    }
    buffer
  }

  override def merge(buffer: CentroidBuffer, other: CentroidBuffer): CentroidBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: CentroidBuffer): Any = {
    val rows = (0 until k).filter(c => buffer.counts(c) > 0).map { c =>
      val base = c * buffer.dim
      val cvec = new Array[Double](buffer.dim)
      var i = 0
      while (i < buffer.dim) {
        cvec(i) = buffer.sums(base + i).toDouble / 1048576.0 /
          buffer.counts(c).toDouble
        i += 1
      }
      InternalRow(c, new GenericArrayData(cvec))
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buffer: CentroidBuffer): Array[Byte] = {
    val n = if (buffer.dim < 0) 0 else buffer.sums.length
    val bb = ByteBuffer.allocate(4 + 8 * k + 8 * n)
    bb.putInt(buffer.dim)
    buffer.counts.foreach(bb.putLong)
    if (n > 0) buffer.sums.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CentroidBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CentroidBuffer(k)
    buf.dim = bb.getInt
    var i = 0
    while (i < k) { buf.counts(i) = bb.getLong; i += 1 }
    if (buf.dim >= 0) {
      buf.sums = new Array[Long](k * buf.dim)
      i = 0
      while (i < buf.sums.length) { buf.sums(i) = bb.getLong; i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CentroidSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CentroidSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

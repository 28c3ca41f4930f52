package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/**
 * Exact (distinct-user count, trip sum) aggregate in ONE exchange.
 *
 * The built-in `countDistinct` is exact but plans two hash exchanges
 * (partial on (key, user), final on key). This TypedImperativeAggregate
 * carries a compact open-addressing Long set of user ids in the partial
 * buffer, so the per-pixel k-anonymity layer (SURVEY.md §2.4 A4 —
 * `Worker.cs:167-222`) aggregates with a single exchange: partial buffers
 * combine map-side, user sets union on merge. Buffer size is bounded by the
 * true distinct-user count per pixel (small by nature — it is the value
 * being counted), never by row count.
 *
 * Output: struct<users: bigint, trips: bigint>.
 */
final class UserSetBuffer(var trips: Long, var size: Int, var table: Array[Long],
                          var hasZero: Boolean) {
  def this() = this(0L, 0, new Array[Long](8), false) // 0L marks empty slots

  private def mask: Int = table.length - 1

  def addUser(u: Long): Unit = {
    if (u == 0L) { if (!hasZero) { hasZero = true; size += 1 }; return }
    var i = (java.lang.Long.hashCode(u) * 0x9E3779B1) & mask
    while (table(i) != 0L) {
      if (table(i) == u) return
      i = (i + 1) & mask
    }
    table(i) = u
    size += 1
    if ((size - (if (hasZero) 1 else 0)) * 2 > table.length) grow()
  }

  private def grow(): Unit = {
    val old = table
    table = new Array[Long](old.length * 2)
    old.foreach { u => if (u != 0L) reinsert(u) }
  }

  private def reinsert(u: Long): Unit = {
    var i = (java.lang.Long.hashCode(u) * 0x9E3779B1) & mask
    while (table(i) != 0L) i = (i + 1) & mask
    table(i) = u
  }

  def mergeFrom(other: UserSetBuffer): Unit = {
    trips += other.trips
    if (other.hasZero) addUser(0L)
    other.table.foreach { u => if (u != 0L) addUser(u) }
  }

  def users: Long = size.toLong

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + 1 + 8 * size)
    bb.putLong(trips)
    bb.putInt(size)
    bb.put(if (hasZero) 1.toByte else 0.toByte)
    table.foreach { u => if (u != 0L) bb.putLong(u) }
    bb.array()
  }
}

object UserSetBuffer {
  def deserialize(bytes: Array[Byte]): UserSetBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new UserSetBuffer()
    buf.trips = bb.getLong
    val n = bb.getInt
    val hasZero = bb.get() == 1
    if (hasZero) buf.addUser(0L)
    var i = if (hasZero) 1 else 0
    while (i < n) { buf.addUser(bb.getLong); i += 1 }
    buf
  }
}

case class UserTripsAgg(
    userCol: Expression,
    tripsCol: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[UserSetBuffer] {

  // analysis-time type contract (a wrong-typed SQL call fails cleanly
  // instead of a mid-job ClassCastException on executors)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (userCol.dataType == LongType && tripsCol.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BIGINT, BIGINT), got " +
        s"(${userCol.dataType.sql}, ${tripsCol.dataType.sql})")
  override def children: Seq[Expression] = Seq(userCol, tripsCol)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("users", LongType, nullable = false),
    StructField("trips", LongType, nullable = false)))

  override def createAggregationBuffer(): UserSetBuffer = new UserSetBuffer()

  override def update(buf: UserSetBuffer, input: InternalRow): UserSetBuffer = {
    val u = userCol.eval(input)
    val t = tripsCol.eval(input)
    if (u != null) buf.addUser(u.asInstanceOf[Long])
    if (t != null) buf.trips += t.asInstanceOf[Long]
    buf
  }

  override def merge(buf: UserSetBuffer, other: UserSetBuffer): UserSetBuffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: UserSetBuffer): Any =
    InternalRow(buf.users, buf.trips)

  override def serialize(buf: UserSetBuffer): Array[Byte] = buf.serialize()

  override def deserialize(bytes: Array[Byte]): UserSetBuffer =
    UserSetBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): UserTripsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): UserTripsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(userCol = newChildren(0), tripsCol = newChildren(1))

  override def prettyName: String = "user_trips"
}

object UserTripsFunctions {
  val Name = "user_trips"

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier(Name)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[UserTripsAgg].getName, Name),
        (exprs: Seq[Expression]) => UserTripsAgg(exprs(0), exprs(1)).toAggregateExpression())
    }
  }

  def userTrips(spark: SparkSession, user: Column, trips: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(Name, user, trips)
  }
}

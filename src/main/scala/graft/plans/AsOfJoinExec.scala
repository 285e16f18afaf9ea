package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Sort-merge physical operator for [[AsOfJoinPlan]].
  *
  * Scale design (the reason this beats the union+window formulation at
  * 100 TB): each side shuffles ONCE on its keys and sorts by
  * (keys, time, ties); the merge then streams both sorted iterators with
  * O(1) state — one carried right row — per key, never materializing a
  * key group. The union+window formulation pays the same single shuffle
  * but WindowExec buffers each (key) partition's rows and carries the
  * last-seen payload per column; this operator also avoids widening left
  * rows with null payload columns through the shuffle.
  *
  * EnsureRequirements satisfies [[requiredChildDistribution]] /
  * [[requiredChildOrdering]], so AQE/codegen'd children compose: the
  * operator only implements the merge.
  */
final case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTies: Seq[Expression],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTime, Ascending) +: rightTies.map(SortOrder(_, Ascending))))

  // the merge emits left rows in their sorted order, so downstream
  // operators can reuse both the partitioning and the (keys, time) sort
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val nRight = rOut.size
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeEval = BindReferences.bindReference(lTime, lOut)
      val rTimeEval = BindReferences.bindReference(rTime, rOut)
      val keyOrdering = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrdering =
        TypeUtils.getInterpretedOrdering(timeType).asInstanceOf[Ordering[Any]]
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      // bind against nullable-widened right attrs: a BoundReference that
      // kept the child's nullable=false would skip the null check and
      // read 0 from the all-null unmatched row
      val resultProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))

      new Iterator[InternalRow] {
        // the one carried right row for the key currently being merged
        private var carry: InternalRow = _
        private var carryKey: InternalRow = _
        // right-side lookahead (rows from the sorter are reused buffers —
        // copy anything that outlives one next() call)
        private var rHead: InternalRow = _
        private var rHeadKey: InternalRow = _
        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rHead = rIter.next().copy()
            rHeadKey = rKeyProj(rHead).copy()
          } else { rHead = null; rHeadKey = null }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lT = lTimeEval.eval(l)
          // consume right rows that are now "in the past" for this left
          // row: keys strictly before lKey (their carry is dead), same-key
          // null-time rows (never match, but sort first — skip, don't
          // stop), and same-key rows with time <= left time (each
          // overwrites the carry; the ties ordering makes the last one
          // the greatest (time, ties) tuple)
          var continue = rHead != null
          while (continue) {
            val cmp = keyOrdering.compare(rHeadKey, lKey)
            if (cmp < 0) advanceRight()
            else if (cmp > 0) continue = false
            else {
              val rT = rTimeEval.eval(rHead)
              if (rT == null) advanceRight()
              else if (lT != null && timeOrdering.lteq(rT, lT)) {
                carry = rHead
                carryKey = rHeadKey
                advanceRight()
              } else continue = false
            }
            if (rHead == null) continue = false
          }
          val matched = carry != null && keyOrdering.compare(carryKey, lKey) == 0
          numOutputRows += 1
          if (matched) numMatched += 1
          resultProj(joined(l, if (matched) carry else nullRight))
        }
      }
    }
  }
}

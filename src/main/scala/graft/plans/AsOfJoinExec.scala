package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BaseOrdering, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.DataType

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
  *
  * Merge discipline (SMJ-grade, r3 verdict item 2): right rows from the
  * sorter are reused buffers and are copied ON PERSIST only — a row is
  * allocated iff it becomes the carry or terminates a scan to wait for a
  * future left row; skipped rows (keys with no left partner, null times)
  * cost zero allocations. Key and time comparisons run through
  * codegen'd orderings over UnsafeProjection outputs — no per-row
  * boxing anywhere in the merge.
  *
  * Whole-stage codegen (r6, the SortMergeJoinExec produce-root shape):
  * the node is the START of a codegen stage — its two sorted inputs
  * stay iterator-fed (a binary merge cannot fuse its inputs), but the
  * merge loop itself is generated Java and everything DOWNSTREAM of the
  * join (project/filter/partial aggregate) fuses with it, consuming the
  * joined row directly. That deletes the iterator's per-row
  * `resultProj` UnsafeRow copy and the virtual next() calls — the
  * interpreted doExecute remains as the spark.sql.codegen.wholeStage=
  * false fallback and pins semantics in NativeAsOfSpec's codegen-off
  * equality case.
  */
final case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTies: Seq[Expression],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode with CodegenSupport {

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
      // time comparison via single-column UnsafeProjections + a codegen'd
      // ordering: no per-row boxing (the interpreted-Ordering/eval path
      // allocated a boxed value per comparison). The left projection's
      // buffer stays valid for the whole right scan of one left row; the
      // right projection re-fills its own buffer per right row.
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val keyOrdering = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrdering = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
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
        // Right-side lookahead. Rows from the sorter are REUSED buffers,
        // but copy-on-persist, not copy-always: a right row needs its own
        // allocation only if it outlives one advance — i.e. it becomes
        // the carry, or it terminates the scan and waits for a future
        // left row. Skipped rows (dead keys, null times) are never
        // copied, so right rows with no left partner cost zero
        // allocations — the same buffering discipline SMJ applies to its
        // streamed side.
        private var rHead: InternalRow = _
        private var rHeadKey: InternalRow = _
        private var rHeadOwned = false
        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rHead = rIter.next()
            rHeadKey = rKeyProj(rHead)
            rHeadOwned = false
          } else { rHead = null; rHeadKey = null; rHeadOwned = true }
        private def persistHead(): Unit =
          if (!rHeadOwned) {
            rHead = rHead.copy()
            rHeadKey = rHeadKey.copy()
            rHeadOwned = true
          }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTimeRow = lTimeProj(l)
          val lTimeNull = lTimeRow.isNullAt(0)
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
            else if (cmp > 0) { persistHead(); continue = false }
            else {
              val rTimeRow = rTimeProj(rHead)
              if (rTimeRow.isNullAt(0)) advanceRight()
              else if (!lTimeNull &&
                  timeOrdering.compare(rTimeRow, lTimeRow) <= 0) {
                persistHead()
                carry = rHead
                carryKey = rHeadKey
                advanceRight()
              } else { persistHead(); continue = false }
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

  // ========================================================== codegen
  // Stage-root codegen: both inputs arrive as iterators (zipped by
  // WholeStageCodegenExec when inputRDDs has two entries); the merge
  // state machine below is the doExecute iterator transcribed to Java,
  // and consume() fuses the downstream pipeline over the JoinedRow.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // output rows reference the left sorter's reused buffer (and the
  // shared JoinedRow) — a buffering parent must copy, same as SMJ
  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val init = new AsOfCodegenInit(leftKeys, rightKeys, leftTime, rightTime,
      left.output, right.output, leftKeys.map(_.dataType), leftTime.dataType)
    val initRef = ctx.addReferenceObj("asofInit", init,
      classOf[AsOfCodegenInit].getName)

    val row = "org.apache.spark.sql.catalyst.InternalRow"
    val leftInput = ctx.addMutableState("scala.collection.Iterator",
      "asofLeftInput", v => s"$v = inputs[0];", forceInline = true)
    val rightInput = ctx.addMutableState("scala.collection.Iterator",
      "asofRightInput", v => s"$v = inputs[1];", forceInline = true)
    val lKeyProj = ctx.addMutableState(
      "org.apache.spark.sql.catalyst.expressions.UnsafeProjection",
      "asofLKeyProj", v => s"$v = $initRef.lKeyProj();")
    val rKeyProj = ctx.addMutableState(
      "org.apache.spark.sql.catalyst.expressions.UnsafeProjection",
      "asofRKeyProj", v => s"$v = $initRef.rKeyProj();")
    val lTimeProj = ctx.addMutableState(
      "org.apache.spark.sql.catalyst.expressions.UnsafeProjection",
      "asofLTimeProj", v => s"$v = $initRef.lTimeProj();")
    val rTimeProj = ctx.addMutableState(
      "org.apache.spark.sql.catalyst.expressions.UnsafeProjection",
      "asofRTimeProj", v => s"$v = $initRef.rTimeProj();")
    val keyOrd = ctx.addMutableState(
      "org.apache.spark.sql.catalyst.expressions.BaseOrdering",
      "asofKeyOrd", v => s"$v = $initRef.keyOrdering();")
    val timeOrd = ctx.addMutableState(
      "org.apache.spark.sql.catalyst.expressions.BaseOrdering",
      "asofTimeOrd", v => s"$v = $initRef.timeOrdering();")
    val nullRight = ctx.addMutableState(row,
      "asofNullRight", v => s"$v = $initRef.nullRight();")
    val joinedRow = ctx.addMutableState(
      "org.apache.spark.sql.catalyst.expressions.JoinedRow",
      "asofJoinedRow", v => s"$v = new org.apache.spark.sql.catalyst.expressions.JoinedRow();")

    val rHead = ctx.addMutableState(row, "asofRHead")
    val rHeadKey = ctx.addMutableState(row, "asofRHeadKey")
    val rHeadOwned = ctx.addMutableState("boolean", "asofRHeadOwned")
    val carry = ctx.addMutableState(row, "asofCarry")
    val carryKey = ctx.addMutableState(row, "asofCarryKey")
    val started = ctx.addMutableState("boolean", "asofStarted")

    val advanceRight = ctx.addNewFunction("asofAdvanceRight",
      s"""
         |private void asofAdvanceRight() {
         |  if ($rightInput.hasNext()) {
         |    $rHead = ($row) $rightInput.next();
         |    $rHeadKey = $rKeyProj.apply($rHead);
         |    $rHeadOwned = false;
         |  } else {
         |    $rHead = null;
         |    $rHeadKey = null;
         |    $rHeadOwned = true;
         |  }
         |}
       """.stripMargin)
    val persistHead = ctx.addNewFunction("asofPersistHead",
      s"""
         |private void asofPersistHead() {
         |  if (!$rHeadOwned) {
         |    $rHead = $rHead.copy();
         |    $rHeadKey = $rHeadKey.copy();
         |    $rHeadOwned = true;
         |  }
         |}
       """.stripMargin)

    val numOutputRows = metricTerm(ctx, "numOutputRows")
    val numMatched = metricTerm(ctx, "numMatched")
    val lRow = ctx.freshName("asofLeftRow")
    val lKey = ctx.freshName("asofLeftKey")
    val lTimeRow = ctx.freshName("asofLeftTime")
    val lTimeNull = ctx.freshName("asofLeftTimeNull")
    val cont = ctx.freshName("asofCont")
    val cmp = ctx.freshName("asofCmp")
    val rTimeRow = ctx.freshName("asofRightTime")
    val matched = ctx.freshName("asofMatched")

    s"""
       |if (!$started) {
       |  $advanceRight();
       |  $started = true;
       |}
       |while ($leftInput.hasNext()) {
       |  $row $lRow = ($row) $leftInput.next();
       |  $row $lKey = $lKeyProj.apply($lRow);
       |  $row $lTimeRow = $lTimeProj.apply($lRow);
       |  boolean $lTimeNull = $lTimeRow.isNullAt(0);
       |  boolean $cont = $rHead != null;
       |  while ($cont) {
       |    int $cmp = $keyOrd.compare($rHeadKey, $lKey);
       |    if ($cmp < 0) {
       |      $advanceRight();
       |    } else if ($cmp > 0) {
       |      $persistHead();
       |      $cont = false;
       |    } else {
       |      $row $rTimeRow = $rTimeProj.apply($rHead);
       |      if ($rTimeRow.isNullAt(0)) {
       |        $advanceRight();
       |      } else if (!$lTimeNull && $timeOrd.compare($rTimeRow, $lTimeRow) <= 0) {
       |        $persistHead();
       |        $carry = $rHead;
       |        $carryKey = $rHeadKey;
       |        $advanceRight();
       |      } else {
       |        $persistHead();
       |        $cont = false;
       |      }
       |    }
       |    if ($rHead == null) $cont = false;
       |  }
       |  boolean $matched = $carry != null && $keyOrd.compare($carryKey, $lKey) == 0;
       |  $numOutputRows.add(1);
       |  if ($matched) $numMatched.add(1);
       |  $joinedRow.apply($lRow, $matched ? $carry : $nullRight);
       |  ${consume(ctx, null, joinedRow)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }
}

/** Per-partition runtime factory for [[AsOfJoinExec]]'s generated merge:
  * the generated class's init() calls these once per partition, so each
  * task gets its own projection buffers (UnsafeProjection is stateful;
  * sharing one instance across concurrent partitions would race).
  * Orderings and the all-null right row are stateless but built through
  * the same seam for symmetry. Lives in the plan's references array —
  * must stay Serializable.
  */
final class AsOfCodegenInit(
    lKeys: Seq[Expression], rKeys: Seq[Expression],
    lTime: Expression, rTime: Expression,
    lOut: Seq[Attribute], rOut: Seq[Attribute],
    keyTypes: Seq[DataType], timeType: DataType) extends Serializable {
  def lKeyProj(): UnsafeProjection = UnsafeProjection.create(lKeys, lOut)
  def rKeyProj(): UnsafeProjection = UnsafeProjection.create(rKeys, rOut)
  def lTimeProj(): UnsafeProjection = UnsafeProjection.create(Seq(lTime), lOut)
  def rTimeProj(): UnsafeProjection = UnsafeProjection.create(Seq(rTime), rOut)
  def keyOrdering(): BaseOrdering =
    RowOrdering.createNaturalAscendingOrdering(keyTypes)
  def timeOrdering(): BaseOrdering =
    RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
  def nullRight(): InternalRow = new GenericInternalRow(rOut.size)
}

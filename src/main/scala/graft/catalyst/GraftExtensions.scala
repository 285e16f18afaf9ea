package graft.catalyst

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.GraftColumnBridge

/** Session extensions registering graft's native expressions so SQL users
  * can call them (`SELECT shingle_hashes(split(text, ' ')) ...`).
  *
  * Install with `.config("spark.sql.extensions",
  * "graft.catalyst.GraftExtensions")`, or call
  * [[GraftFunctions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.shingleHashesDescriptor)
    ext.injectFunction(GraftFunctions.cosineSimilarityDescriptor)
    ext.injectFunction(GraftFunctions.l2sqDistanceDescriptor)
    ext.injectFunction(GraftFunctions.sortedIntersectCountDescriptor)
    ext.injectFunction(GraftFunctions.jaroWinklerDescriptor)
    ext.injectFunction(GraftFunctions.packSortedLongsDescriptor)
    ext.injectFunction(GraftFunctions.packedIntersectCountDescriptor)
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
    ext.injectOptimizerRule(_ => RangeJoinBinningRule)
  }
}

object GraftFunctions {
  private[catalyst] val shingleHashesDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("shingle_hashes"),
    new ExpressionInfo(classOf[ShingleHash].getName, "shingle_hashes"),
    (args: Seq[Expression]) => ShingleHash(args.head))

  private[catalyst] val cosineSimilarityDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
    (args: Seq[Expression]) => CosineSimilarity(args(0), args(1)))

  private[catalyst] val l2sqDistanceDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("l2sq_distance"),
    new ExpressionInfo(classOf[L2SqDistance].getName, "l2sq_distance"),
    (args: Seq[Expression]) => L2SqDistance(args(0), args(1)))

  private[catalyst] val sortedIntersectCountDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sorted_intersect_count"),
    new ExpressionInfo(
      classOf[SortedIntersectCount].getName, null, "sorted_intersect_count",
      "sorted_intersect_count(a, b) - Size of the intersection of two " +
        "integral arrays. PRECONDITION: both arrays sorted ascending, " +
        "duplicate-free, non-nullable elements (sort_array(collect_set" +
        "(...))-shaped); unsorted input is silently wrong.", ""),
    (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1)))

  private[catalyst] val jaroWinklerDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
    (args: Seq[Expression]) => JaroWinkler(args(0), args(1)))

  private[catalyst] val packSortedLongsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("pack_sorted_longs"),
    new ExpressionInfo(
      classOf[PackSortedLongs].getName, null, "pack_sorted_longs",
      "pack_sorted_longs(arr) - Delta+zigzag-varint packing of an " +
        "array<bigint> into BINARY. Any array round-trips exactly; " +
        "sorted distinct ids pack at 1-3 bytes per element.", ""),
    (args: Seq[Expression]) => PackSortedLongs(args.head))

  private[catalyst] val packedIntersectCountDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("packed_intersect_count"),
    new ExpressionInfo(
      classOf[PackedIntersectCount].getName, null, "packed_intersect_count",
      "packed_intersect_count(a, b) - Intersection size of two " +
        "pack_sorted_longs buffers by an on-the-fly varint merge walk. " +
        "PRECONDITION: packed from ascending-sorted duplicate-free " +
        "arrays; unsorted input is silently wrong.", ""),
    (args: Seq[Expression]) => PackedIntersectCount(args(0), args(1)))

  /** Idempotently register graft functions on a live session (for
    * sessions built without the extensions config). */
  def register(spark: SparkSession): Unit =
    Seq(shingleHashesDescriptor, cosineSimilarityDescriptor,
      l2sqDistanceDescriptor, sortedIntersectCountDescriptor,
      jaroWinklerDescriptor, packSortedLongsDescriptor,
      packedIntersectCountDescriptor).foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }

  /** Column-API form of [[ShingleHash]]. */
  def shingleHashes(tokens: Column): Column =
    GraftColumnBridge.column(ShingleHash(GraftColumnBridge.expression(tokens)))

  /** Column-API form of [[RollingSpanHash]]. */
  def rollingSpanHashes(text: Column, span: Int): Column =
    GraftColumnBridge.column(
      RollingSpanHash(GraftColumnBridge.expression(text), span))

  /** Column-API form of [[CosineSimilarity]]. */
  def cosineSimilarity(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimilarity(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column-API form of [[L2SqDistance]]. */
  def l2sqDistance(a: Column, b: Column): Column =
    GraftColumnBridge.column(L2SqDistance(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column-API form of [[SortedIntersectCount]]. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedIntersectCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column-API form of [[JaroWinkler]]. */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaroWinkler(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column-API form of [[PackSortedLongs]]. */
  def packSortedLongs(arr: Column): Column =
    GraftColumnBridge.column(PackSortedLongs(GraftColumnBridge.expression(arr)))

  /** Column-API form of [[PackedIntersectCount]]. */
  def packedIntersectCount(a: Column, b: Column): Column =
    GraftColumnBridge.column(PackedIntersectCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column-API form of [[CmsEstimate]] probing a frozen sketch. (No SQL
    * descriptor: the expression embeds the sketch table, which SQL
    * argument lists cannot carry.) */
  def cmsEstimate(term: Column, sketch: graft.ml.CMSketch): Column =
    GraftColumnBridge.column(CmsEstimate(
      GraftColumnBridge.expression(term),
      sketch.depth, sketch.width, sketch.table))
}

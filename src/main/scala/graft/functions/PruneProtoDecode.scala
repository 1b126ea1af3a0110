package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Alias, AttributeReference, Expression, ExprId, GetStructField, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule pushing STRUCT-FIELD PROJECTION into [[ProtoDecode]] —
  * the codec analogue of Parquet nested-column pruning (and of Spark's own
  * OptimizeCsvJsonExprs, which does the same schema narrowing for
  * from_json): when a plan only ever reads `decode(payload).repo/.path/.seq`,
  * the decoder should length-skip every other field's wire bytes instead of
  * materializing them. For the CDC envelope the skipped field is `content` —
  * the fat one — so an audit/metadata query over a 100 TB change log never
  * allocates the file bodies at all. Decoding stays structurally identical
  * (output type is the full struct; pruned fields surface as proto
  * defaults), so the rule is safe exactly when nothing reads the pruned
  * ordinals — which is what it proves before rewriting.
  *
  * Two plan shapes are handled (whichever the upstream optimizer produced):
  *  A. `GetStructField(ProtoDecode(..), ord)` inline in one Project — the
  *     CollapseProject/NestedColumnAliasing outcome;
  *  B. `Project[.. m.f ..] <- Project[Alias(ProtoDecode(..), m)]` — the
  *     uncollapsed two-level shape (the decode referenced several times is
  *     deliberately NOT inlined by CollapseProject).
  * In both: collect the ordinals every use touches; a BARE use of the whole
  * struct anywhere disables pruning for that decode; only a STRICT subset
  * rewrites. Idempotent (a second pass computes the same set and leaves the
  * plan untouched), so it converges inside a fixed-point batch.
  */
object PruneProtoDecode extends Rule[LogicalPlan] {

  /** Register on an already-built session (dedup-guarded — query fns may
    * run twice per bench). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  // group decodes by (schema, message, canonicalized input) — Left(text)
  // schemas compare structurally; Right(bytes) via toSeq
  private type Key = (Either[String, Seq[Byte]], String, Expression)
  private def keyOf(pd: ProtoDecode): Key =
    (pd.schemaSource.map(_.toSeq), pd.messageType, pd.child.canonicalized)

  private final class Uses {
    val ordinals = scala.collection.mutable.Map.empty[Key, scala.collection.mutable.Set[Int]]
    val bare = scala.collection.mutable.Set.empty[Key]
    def scan(e: Expression): Unit = e match {
      case GetStructField(pd: ProtoDecode, ord, _) =>
        ordinals.getOrElseUpdate(keyOf(pd), scala.collection.mutable.Set.empty) += ord
        pd.children.foreach(scan)
      case pd: ProtoDecode =>
        bare += keyOf(pd); pd.children.foreach(scan)
      case other => other.children.foreach(scan)
    }
    /** the pruned field-number set for `pd`, when pruning is provably safe
      * and STRICTLY NARROWING — an explicitly-constructed allowed set is
      * never widened back (the user asked for fewer fields; resurrecting
      * one because a projection names it would override that intent). */
    def pruneSet(pd: ProtoDecode): Option[Set[Int]] =
      ordinals.get(keyOf(pd)) match {
        case Some(ords) if !bare(keyOf(pd)) =>
          PruneProtoDecode.narrowed(pd, ords.toSet)
        case _ => None
      }
  }

  /** `Some(accessed-numbers)` iff that set strictly narrows `pd`'s current
    * effective set; `None` otherwise (incl. the widening case). */
  private def narrowed(pd: ProtoDecode, ords: Set[Int]): Option[Set[Int]] = {
    val nums = ords.map(pd.numberOfOrdinal(_))
    val cur = pd.allowed.getOrElse(pd.numberOfOrdinal.toSet)
    if (nums.subsetOf(cur) && nums != cur) Some(nums) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // ONE handler applying both shapes, so a Project that qualifies for
    // both (e.g. an inline decode in the upper list over a lower project
    // aliasing another decode) gets both rewrites in the same pass.
    case p: Project =>
      // Shape A: inline GetStructField(ProtoDecode) within this Project.
      val listA: Seq[NamedExpression] =
        if (!p.projectList.exists(_.exists {
          case GetStructField(_: ProtoDecode, _, _) => true; case _ => false
        })) p.projectList
        else {
          val uses = new Uses
          p.projectList.foreach(uses.scan)
          p.projectList.map(_.transform {
            case g @ GetStructField(pd: ProtoDecode, _, _) =>
              uses.pruneSet(pd) match {
                case Some(nums) => g.copy(child = pd.copy(allowed = Some(nums)))
                case None => g
              }
          }.asInstanceOf[NamedExpression])
        }
      // Shape B: narrow a child-project decode alias from this project's
      // accesses of its output attribute.
      val newChild = p.child match {
        case low: Project if low.projectList.exists(a => a.isInstanceOf[Alias] &&
            a.asInstanceOf[Alias].child.isInstanceOf[ProtoDecode]) =>
          val decodeByAttr: Map[ExprId, ProtoDecode] = low.projectList.collect {
            case a @ Alias(pd: ProtoDecode, _) => a.exprId -> pd
          }.toMap
          val ords = scala.collection.mutable.Map.empty[ExprId, scala.collection.mutable.Set[Int]]
          val bareAttr = scala.collection.mutable.Set.empty[ExprId]
          def scanUp(e: Expression): Unit = e match {
            case GetStructField(ar: AttributeReference, ord, _) if decodeByAttr.contains(ar.exprId) =>
              ords.getOrElseUpdate(ar.exprId, scala.collection.mutable.Set.empty) += ord
            case ar: AttributeReference if decodeByAttr.contains(ar.exprId) =>
              bareAttr += ar.exprId
            case other => other.children.foreach(scanUp)
          }
          p.projectList.foreach(scanUp)
          val newLower = low.projectList.map {
            case a @ Alias(pd: ProtoDecode, name) if ords.contains(a.exprId) && !bareAttr(a.exprId) =>
              narrowed(pd, ords(a.exprId).toSet) match {
                case Some(nums) => Alias(pd.copy(allowed = Some(nums)), name)(
                  a.exprId, a.qualifier, a.explicitMetadata, a.nonInheritableMetadataKeys)
                case None => a
              }
            case other => other
          }
          if (newLower.zip(low.projectList).forall { case (x, y) => x eq y }) low
          else low.copy(projectList = newLower)
        case c => c
      }
      if ((newChild eq p.child) &&
        listA.zip(p.projectList).forall { case (x, y) => x eq y }) p
      else Project(listA, newChild)
  }
}

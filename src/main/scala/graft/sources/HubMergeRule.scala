package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And => CatAnd, AttributeReference, CaseWhen, Cast, EqualTo => CatEqualTo, Expression, If, IsNotNull, Literal, Not => CatNot, Or => CatOr}
import org.apache.spark.sql.catalyst.plans.{FullOuter, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, Filter => LFilter, InsertAction, InsertStarAction, Join, JoinHint, LogicalPlan, MergeIntoTable, Project, UpdateAction, UpdateStarAction}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftbridge.GraftMergeCommand

/** Resolution rule making `MERGE INTO` SQL work against graft-hub tables
  * (registered by [[graft.GraftExtensions]]):
  *
  * {{{
  *   MERGE INTO hub.default.t AS t USING src AS s
  *   ON t.k = s.k
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * The hub's merge IS this upsert (last-writer-wins on the keys, null-key
  * rows insert, schema widening — [[graft.writers.HubWriter.merge]]), so
  * the canonical MERGE shape rewrites to one ACID
  * [[graft.writers.VersionedHub.write]] commit with the keys extracted
  * from the ON equality conjuncts. Star actions are accepted both
  * unexpanded (`UPDATE SET *`) and as the analyzer's expanded full-column
  * name-matched assignment lists (possibly cast-wrapped: the hub widens
  * types on merge, its documented semantics).
  *
  * Every other Delta-expressible row shape lowers through
  * [[generalMergePlans]] onto the SAME single atomic commit: ordered
  * conditional matched branches (`WHEN MATCHED [AND c] THEN UPDATE SET
  * col = expr | DELETE`, first applicable wins), partial-column updates
  * (unmentioned columns keep target values), conditional/partial INSERT
  * lists (unmentioned columns NULL), insert-only and matched-only
  * merges, and `WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE | DELETE`
  * (a full-outer join supplies the target-only rows; inherently
  * O(target), as in every engine — the branch's semantics quantify over
  * the whole target). The ON condition may carry EXTRA non-key
  * conjuncts (`ON t.k = s.k AND t.date = …`, Delta's standard
  * partition-restricting idiom): they restrict the MATCHED set, rows
  * they exclude route to the NOT MATCHED / NOT MATCHED BY SOURCE
  * branches, and an INSERT that would land on a key still occupied by
  * a surviving excluded target row is refused (the keyed hub cannot
  * store Delta's duplicate).
  * Refused loudly rather than silently approximated: NOT MATCHED BY
  * SOURCE rows whose merge key is NULL (the keyed upsert/delete cannot
  * address them — rewrite as DELETE FROM with a predicate), UPDATE SET
  * on a merge key, values
  * that cannot losslessly widen to their column type, and — in the
  * general shape — multiple source rows matching one target row with an
  * UPDATE/DELETE branch applicable (the standard SQL/Delta cardinality
  * error; see [[GraftMergeCommand]]). The CANONICAL star/star shape is
  * the hub's native keyed upsert and keeps its documented
  * last-writer-wins-on-duplicate-source-keys semantics, same as the
  * programmatic `VersionedHub.write` API.
  */
case class HubMergeRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def hubOf(plan: LogicalPlan): Option[HubTable] =
    plan.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[HubTable] =>
        r.table.asInstanceOf[HubTable]
    }

  /** Strip the wrappers the analyzer layers over star-expanded assignments
    * and coerced ON terms: casts (the hub widens on merge anyway) and
    * null-intolerance asserts.
    */
  private def unwrapCast(e: Expression): Expression = e match {
    case c: Cast => unwrapCast(c.child)
    case a: org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull =>
      unwrapCast(a.child)
    case other => other
  }

  private def fail(what: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "UNSUPPORTED_FEATURE.TABLE_OPERATION",
      messageParameters = Map(
        "tableName" -> "graft-hub",
        "operation" ->
          (s"this MERGE shape ($what). graft-hub MERGE INTO supports " +
            "the keyed upsert form: ON equi-join of identically-named " +
            "columns, WHEN MATCHED THEN UPDATE SET *, WHEN NOT MATCHED " +
            "THEN INSERT *")))

  /** ON conjuncts, split two ways: conjuncts equating a target column
    * with an identically-named source column become merge KEYS; every
    * other deterministic conjunct is an EXTRA match predicate (Delta's
    * standard partition-restricting idiom `ON t.k = s.k AND t.date = …`).
    * Extras restrict the MATCHED set only: rows they exclude route to
    * the NOT MATCHED / NOT MATCHED BY SOURCE branches, exactly as in
    * Delta — the join in [[generalMergePlans]] consumes the full ON
    * condition verbatim, so nothing further is needed to route them
    * (and Catalyst pushes single-side extras into the target scan,
    * where the hub's per-file stats prune). At least one key equality
    * is still required — the hub's commit is keyed.
    */
  private def splitOn(cond: Expression, target: LogicalPlan,
      source: LogicalPlan): (Seq[String], Seq[Expression]) = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case CatAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val (keys, extras) = conjuncts(cond).map(c => (c, c match {
      case CatEqualTo(l, r) => (unwrapCast(l), unwrapCast(r))
      case other => (other, other)
    })).map {
      case (_, (a: AttributeReference, b: AttributeReference))
          if (target.outputSet.contains(a) && source.outputSet.contains(b) &&
            a.name.equalsIgnoreCase(b.name)) ||
            (target.outputSet.contains(b) && source.outputSet.contains(a) &&
              a.name.equalsIgnoreCase(b.name)) =>
        val t = if (target.outputSet.contains(a)) a else b
        Left(t.name)
      case (orig, _) =>
        if (!orig.deterministic)
          fail(s"non-deterministic ON condition term $orig")
        if (orig.exists(
            _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]))
          fail(s"subquery in ON condition term $orig")
        Right(orig)
    }.partitionMap(identity)
    (keys.distinct, extras)
  }

  /** An expanded assignment list is "star-like" when it covers every target
    * column with the identically-named source column (casts allowed — the
    * hub widens on merge).
    */
  private def starLike(assigns: Seq[Assignment], target: LogicalPlan,
      source: LogicalPlan): Boolean = {
    val covered = assigns.flatMap { a =>
      (unwrapCast(a.key), unwrapCast(a.value)) match {
        case (k: AttributeReference, v: AttributeReference)
            if k.name.equalsIgnoreCase(v.name) &&
              target.outputSet.contains(k) && source.outputSet.contains(v) =>
          Some(k.name.toLowerCase(java.util.Locale.ROOT))
        case _ => None
      }
    }
    covered.length == assigns.length &&
      target.output.map(_.name.toLowerCase(java.util.Locale.ROOT))
        .forall(covered.toSet.contains)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case m: MergeIntoTable
        if m.targetTable.resolved && m.sourceTable.resolved &&
          m.mergeCondition.resolved && hubOf(m.targetTable).isDefined =>
      val table = hubOf(m.targetTable).get
      val path = table.hubPath
      if (table.isTimeTravel)
        fail("cannot MERGE INTO a VERSION AS OF snapshot")
      val (keys, extras) = splitOn(m.mergeCondition, m.targetTable,
        m.sourceTable)
      if (keys.isEmpty) fail("no usable key equalities in ON")
      val matchedStar = m.matchedActions match {
        case Seq(UpdateStarAction(None)) => true
        case Seq(UpdateAction(None, assigns, _)) =>
          starLike(assigns, m.targetTable, m.sourceTable)
        case _ => false
      }
      val insertStar = m.notMatchedActions match {
        case Seq(InsertStarAction(None)) => true
        case Seq(InsertAction(None, assigns)) =>
          starLike(assigns, m.targetTable, m.sourceTable)
        case _ => false
      }
      if (matchedStar && insertStar && m.notMatchedBySourceActions.isEmpty &&
          extras.isEmpty) {
        // a GENERATED ALWAYS AS IDENTITY column accepts no explicit
        // values: the star shape feeds the source straight to the upsert,
        // so a source carrying the column would smuggle them in — refuse,
        // Delta-style (list the insert columns explicitly and omit it)
        val strict = graft.writers.VersionedHub
          .identitySpecs(Some(table.schema()))
          .filterNot(_._2.allowExplicit).map(_._1.name)
        val carried = strict.filter(n =>
          m.sourceTable.output.exists(_.name.equalsIgnoreCase(n)))
        if (carried.nonEmpty)
          fail(s"MERGE */star source provides identity column(s) " +
            s"${carried.mkString(", ")} — GENERATED ALWAYS AS IDENTITY " +
            "accepts no explicit values; drop the column from the source")
        // the canonical shape: the hub merge IS this upsert — the source
        // feeds it directly (columns aligned to the target's exact casing)
        val tgtNames: Map[String, String] = m.targetTable.output
          .map(a => a.name.toLowerCase(java.util.Locale.ROOT) -> a.name).toMap
        val projected = m.sourceTable.output.map { a =>
          tgtNames.get(a.name.toLowerCase(java.util.Locale.ROOT)) match {
            case Some(exact) if exact != a.name => Alias(a, exact)()
            case _ => a
          }
        }
        val src =
          if (projected.forall(_.isInstanceOf[AttributeReference])) m.sourceTable
          else Project(projected, m.sourceTable)
        GraftMergeCommand(path, keys, src)
      } else {
        // GENERAL shape — any ordered cascade of conditional
        // UPDATE/DELETE matched branches plus conditional/partial INSERT
        // branches (insert-only and matched-only merges included): the
        // hub's keyed upsert replaces whole rows, so the source is
        // LEFT-JOINED to the target snapshot on the keys (FULL-outer when
        // NOT MATCHED BY SOURCE branches need the target-only rows too)
        // and every row is routed by the FIRST branch whose condition
        // holds — update rows feed the upsert (unmentioned columns keep
        // target values), delete rows feed the same commit's atomic
        // `deletes`, rows with no applicable branch are left untouched.
        // Under a concurrent commit the carried columns hold the
        // join-time snapshot's values — the same read-committed race
        // every engine's MERGE has.
        // generated columns from the RECORDED schema (DSv2 relation
        // attributes do not carry field metadata)
        val genCols = table.schema().fields.toSeq
          .filter(org.apache.spark.sql.catalyst.util.GeneratedColumn
            .isGeneratedColumn)
          .map(_.name.toLowerCase(java.util.Locale.ROOT)).toSet
        val idSpecs = graft.writers.VersionedHub
          .identitySpecs(Some(table.schema()))
        val idAll = idSpecs.map(_._1.name.toLowerCase(java.util.Locale.ROOT))
          .toSet
        val idStrict = idSpecs.filterNot(_._2.allowExplicit)
          .map(_._1.name.toLowerCase(java.util.Locale.ROOT)).toSet
        val plans = generalMergePlans(m, keys, hasExtras = extras.nonEmpty,
          genCols, idAll, idStrict)
        GraftMergeCommand(path, keys, plans.src, plans.deletes,
          plans.matchedKeys, plans.nmbsNullKeys, plans.insertKeys,
          plans.targetKeys)
      }
  }

  private sealed trait MatchedKind
  private case class UpdKind(star: Boolean,
      assigns: Map[String, Expression]) extends MatchedKind
  private case object DelKind extends MatchedKind

  /** The joined plans for every non-canonical MERGE shape — see the
    * caller's note. `src` emits exactly the target's columns (update +
    * insert + not-matched-by-source-update rows); `deletes` (present iff
    * a DELETE branch exists on either side) emits exactly the key
    * columns; `matchedKeys` (present iff any matched UPDATE/DELETE branch
    * exists) emits the key of every source row routed to modify a matched
    * target row, so the command can raise the standard
    * multiple-source-rows-matched error — SQL MERGE and Delta both fail
    * loudly there, because routing one target row through two source rows
    * (worst case: to `deletes` AND back in through the upsert) would be
    * nondeterministic; `nmbsNullKeys` (present iff NOT MATCHED BY SOURCE
    * branches exist) emits one row per NULL-keyed target row those
    * branches would modify — the keyed upsert/delete cannot address such
    * rows, so the command refuses loudly instead of silently skipping or
    * duplicating them; `insertKeys`/`targetKeys` (present iff the ON
    * carries EXTRA non-key conjuncts and an INSERT branch exists) let the
    * command refuse the one shape the keyed hub cannot represent — an
    * INSERT-routed source row whose key already exists on a surviving
    * target row (its match was excluded by the extra conjunct; Delta
    * would store two rows under that key, the hub's upsert would silently
    * replace one).
    */
  private case class GeneralPlans(src: LogicalPlan,
      deletes: Option[LogicalPlan], matchedKeys: Option[LogicalPlan],
      nmbsNullKeys: Option[LogicalPlan],
      insertKeys: Option[LogicalPlan] = None,
      targetKeys: Option[LogicalPlan] = None)

  private def generalMergePlans(m: MergeIntoTable, keys: Seq[String],
      hasExtras: Boolean, genCols: Set[String],
      idAll: Set[String] = Set.empty,
      idStrict: Set[String] = Set.empty): GeneralPlans = {
    def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    val lcKeys = keys.map(lc).toSet
    val srcByName = m.sourceTable.output.map(a => lc(a.name) -> a).toMap
    def assignMap(assigns: Seq[Assignment],
        what: String): Map[String, Expression] =
      assigns.flatMap { a =>
        unwrapCast(a.key) match {
          case k: AttributeReference if m.targetTable.outputSet.contains(k) =>
            // is this the analyzer's star-expansion identity form
            // (col = s.col)?
            def mirrorsSource: Boolean = unwrapCast(a.value) match {
              case v: AttributeReference =>
                v.name.equalsIgnoreCase(k.name) &&
                  m.sourceTable.outputSet.contains(v)
              case _ => false
            }
            // UPDATE on a GENERATED ALWAYS AS column is refused unless it
            // is the star-expansion form — the column recomputes from its
            // expression at write time, and the write path validates any
            // explicitly provided value anyway
            if (what.contains("UPDATE") && genCols.contains(lc(k.name)) &&
                !mirrorsSource)
              fail(s"$what SET on generated column ${k.name} — it " +
                "recomputes from its GENERATED ALWAYS AS expression")
            // identity values are birth-assigned and immutable on UPDATE;
            // the star-expansion form is DROPPED from the map so the
            // matched row keeps its target value
            if (what.contains("UPDATE") && idAll.contains(lc(k.name))) {
              if (!mirrorsSource)
                fail(s"$what SET on identity column ${k.name} — " +
                  "GENERATED AS IDENTITY values are assigned at insert " +
                  "and immutable")
              None
            } else if (!what.contains("UPDATE") &&
                idStrict.contains(lc(k.name))) {
              // INSERT providing a GENERATED ALWAYS AS IDENTITY value
              fail(s"$what assigns identity column ${k.name} — GENERATED " +
                "ALWAYS AS IDENTITY accepts no explicit values; omit it " +
                "and the write allocates one")
            } else Some(lc(k.name) -> a.value)
          case other => fail(s"$what assignment target $other is not a " +
            "top-level target column")
        }
      }.toMap
    val matchedBranches: Seq[(Option[Expression], MatchedKind)] =
      m.matchedActions.map {
        case UpdateStarAction(c) => (c, UpdKind(star = true, Map.empty))
        case UpdateAction(c, assigns, _) =>
          (c, UpdKind(star = false, assignMap(assigns, "UPDATE")))
        case DeleteAction(c) => (c, DelKind)
        case other => fail(s"unsupported WHEN MATCHED action $other")
      }
    // NOT MATCHED BY SOURCE branches act on target rows with no source
    // match: UPDATE assignments/conditions may reference target columns
    // only (Spark's analyzer enforces it), DELETE routes the key to the
    // commit's atomic deletes — Delta's full branch matrix.
    val nmbsBranches: Seq[(Option[Expression], MatchedKind)] =
      m.notMatchedBySourceActions.map {
        case UpdateAction(c, assigns, _) =>
          (c, UpdKind(star = false,
            assignMap(assigns, "NOT MATCHED BY SOURCE UPDATE")))
        case DeleteAction(c) => (c, DelKind)
        case other =>
          fail(s"unsupported WHEN NOT MATCHED BY SOURCE action $other")
      }
    val hasNmbs = nmbsBranches.nonEmpty
    // a MATCHED-branch assignment of a key to the identically-named
    // source column is an identity under the equi-join (the analyzer's
    // star expansion emits exactly that) — any other key assignment
    // would insert the new key and strand the old row
    def keyIdentity(k: String, v: Expression): Boolean = unwrapCast(v) match {
      case a: AttributeReference => lc(a.name) == k &&
        m.sourceTable.outputSet.contains(a)
      case _ => false
    }
    for ((_, UpdKind(false, am)) <- matchedBranches
         if am.exists { case (k, v) => lcKeys.contains(k) && !keyIdentity(k, v) })
      fail("UPDATE SET on a merge KEY column — the keyed upsert would " +
        "insert the new key and strand the old row; delete + insert instead")
    for ((_, UpdKind(false, am)) <- nmbsBranches
         if am.keySet.exists(lcKeys.contains))
      fail("UPDATE SET on a merge KEY column — the keyed upsert would " +
        "insert the new key and strand the old row; delete + insert instead")
    val insertBranches: Seq[(Option[Expression],
        (Boolean, Map[String, Expression]))] =
      m.notMatchedActions.map {
        case InsertStarAction(c) => (c, (true, Map.empty[String, Expression]))
        case InsertAction(c, assigns) =>
          (c, (false, assignMap(assigns, "INSERT")))
        case other => fail(s"unsupported WHEN NOT MATCHED action $other")
      }
    // matched ⟺ the equi-joined target key is non-null (null keys never
    // equi-match, so a non-null joined key attr marks a real match)
    val keyAttr = m.targetTable.output
      .find(a => lc(a.name) == lc(keys.head))
      .getOrElse(fail(s"key ${keys.head} missing from the target output"))
    def srcAttr(name: String): Expression = srcByName.getOrElse(lc(name),
      fail(s"INSERT */UPDATE SET * needs source column $name"))
    def shaped(e: Expression, dt: org.apache.spark.sql.types.DataType,
        what: String): Expression =
      if (e.dataType == dt) e
      else if (Cast.canUpCast(e.dataType, dt)) Cast(e, dt)
      else fail(s"$what expression of type ${e.dataType.sql} cannot " +
        s"losslessly widen to the target column type ${dt.sql}")
    // SQL MERGE routes each row by the FIRST branch whose condition holds
    // (a null condition is false); no applicable branch = untouched (or,
    // for unmatched rows, dropped). CaseWhen encodes exactly that.
    def firstKindIs(p: MatchedKind => Boolean): Expression =
      if (matchedBranches.isEmpty) Literal(false)
      else CaseWhen(matchedBranches.map { case (c, k) =>
        (c.getOrElse(Literal.TrueLiteral), Literal(p(k))) },
        Some(Literal(false)))
    val isUpd = firstKindIs(_.isInstanceOf[UpdKind])
    val isDel = firstKindIs(_ == DelKind)
    val isIns: Expression =
      if (insertBranches.isEmpty) Literal(false)
      else CaseWhen(insertBranches.map { case (c, _) =>
        (c.getOrElse(Literal.TrueLiteral), Literal(true)) },
        Some(Literal(false)))
    def nmbsKindIs(p: MatchedKind => Boolean): Expression =
      if (nmbsBranches.isEmpty) Literal(false)
      else CaseWhen(nmbsBranches.map { case (c, k) =>
        (c.getOrElse(Literal.TrueLiteral), Literal(p(k))) },
        Some(Literal(false)))
    val isNmbsUpd = nmbsKindIs(_.isInstanceOf[UpdKind])
    val isNmbsDel = nmbsKindIs(_ == DelKind)
    // per-column values: among rows kept by isUpd/isIns, scanning the
    // branch conditions in order lands on the routing branch — earlier
    // branches of the OTHER kind have false conditions for these rows
    // an UPDATE-routed row's carried GENERATED ALWAYS AS value reflects
    // the PRE-update row: emit NULL for it unless explicitly assigned, so
    // the write path recomputes it from the post-update values (NULL =
    // "fill from the expression" there)
    def isGenerated(t: org.apache.spark.sql.catalyst.expressions.Attribute): Boolean =
      genCols.contains(lc(t.name))
    def updValue(t: org.apache.spark.sql.catalyst.expressions.Attribute): Expression = {
      val upds = matchedBranches.collect { case (c, u: UpdKind) => (c, u) }
      if (upds.isEmpty) t
      else CaseWhen(upds.map { case (c, u) =>
        (c.getOrElse(Literal.TrueLiteral), shaped(
          // identity columns are immutable: star updates keep the TARGET's
          // value (the matched row's birth-assigned id)
          if (u.star) {
            if (idAll.contains(lc(t.name))) t else srcAttr(t.name)
          } else u.assigns.getOrElse(lc(t.name),
            if (isGenerated(t)) Literal(null, t.dataType) else t),
          t.dataType, s"WHEN MATCHED value for ${t.name}")) }, Some(t))
    }
    def insValue(t: org.apache.spark.sql.catalyst.expressions.Attribute): Expression =
      if (insertBranches.isEmpty) Literal(null, t.dataType)
      else CaseWhen(insertBranches.map { case (c, (star, am)) =>
        (c.getOrElse(Literal.TrueLiteral), shaped(
          if (star) {
            if (idStrict.contains(lc(t.name)) &&
                srcByName.contains(lc(t.name)))
              fail(s"INSERT * provides identity column ${t.name} — " +
                "GENERATED ALWAYS AS IDENTITY accepts no explicit values; " +
                "list the insert columns and omit it")
            // star insert on an identity table whose source omits the
            // column: allocate at write (NULL here)
            if (idAll.contains(lc(t.name)) && !srcByName.contains(lc(t.name)))
              Literal(null, t.dataType)
            else srcAttr(t.name)
          } else am.getOrElse(lc(t.name), Literal(null, t.dataType)),
          t.dataType, s"WHEN NOT MATCHED value for ${t.name}")) },
        Some(Literal(null, t.dataType)))
    // join shape: LEFT-outer (source-driven) when only matched/insert
    // branches exist; FULL-outer when NOT MATCHED BY SOURCE needs the
    // target-only rows too. Sides are detected by literal-TRUE marker
    // columns, not value nullability: a legitimately all-NULL row must
    // still count as present, and after a full-outer join only a column
    // that cannot be NULL on its own side marks absence reliably.
    val srcTag = Alias(Literal(true), "__graft_src_present")()
    val tgtTag = Alias(Literal(true), "__graft_tgt_present")()
    val (join, matched, sourceOnly, targetOnly) =
      if (!hasNmbs) {
        val j = Join(m.sourceTable, m.targetTable, LeftOuter,
          Some(m.mergeCondition), JoinHint.NONE)
        (j, IsNotNull(keyAttr): Expression,
          CatNot(IsNotNull(keyAttr)): Expression, Literal(false): Expression)
      } else {
        val j = Join(
          Project(m.sourceTable.output :+ srcTag, m.sourceTable),
          Project(m.targetTable.output :+ tgtTag, m.targetTable),
          FullOuter, Some(m.mergeCondition), JoinHint.NONE)
        val s = IsNotNull(srcTag.toAttribute)
        val t = IsNotNull(tgtTag.toAttribute)
        (j, CatAnd(s, t): Expression, CatAnd(s, CatNot(t)): Expression,
          CatAnd(CatNot(s), t): Expression)
      }
    def nmbsValue(t: org.apache.spark.sql.catalyst.expressions.Attribute): Expression = {
      val upds = nmbsBranches.collect { case (c, u: UpdKind) => (c, u) }
      if (upds.isEmpty) t
      else CaseWhen(upds.map { case (c, u) =>
        (c.getOrElse(Literal.TrueLiteral), shaped(
          u.assigns.getOrElse(lc(t.name),
            if (isGenerated(t)) Literal(null, t.dataType) else t),
          t.dataType,
          s"WHEN NOT MATCHED BY SOURCE value for ${t.name}")) }, Some(t))
    }
    def rowValue(t: org.apache.spark.sql.catalyst.expressions.Attribute): Expression =
      if (!hasNmbs) If(matched, updValue(t), insValue(t))
      else If(matched, updValue(t),
        If(sourceOnly, insValue(t), nmbsValue(t)))
    val routeFilter =
      if (!hasNmbs) CatOr(CatAnd(matched, isUpd),
        CatAnd(CatNot(matched), isIns))
      else CatOr(CatOr(CatAnd(matched, isUpd), CatAnd(sourceOnly, isIns)),
        CatAnd(targetOnly, isNmbsUpd))
    val upsertRows = Project(
      m.targetTable.output.map(t => Alias(rowValue(t), t.name)()),
      LFilter(routeFilter, join))
    def keyProject(cond: Expression): LogicalPlan = Project(
      keys.map { k =>
        val t = m.targetTable.output.find(a => lc(a.name) == lc(k))
          .getOrElse(fail(s"key $k missing from the target output"))
        Alias(t, k)()
      },
      LFilter(cond, join))
    val deletes =
      if (!(matchedBranches ++ nmbsBranches).exists(_._2 == DelKind)) None
      else Some(keyProject(
        if (!hasNmbs) CatAnd(matched, isDel)
        else CatOr(CatAnd(matched, isDel), CatAnd(targetOnly, isNmbsDel))))
    val matchedKeys =
      if (matchedBranches.isEmpty) None
      else Some(keyProject(CatAnd(matched, CatOr(isUpd, isDel))))
    val nmbsNullKeys =
      if (!hasNmbs) None
      else {
        val anyKeyNull = keys.map { k =>
          val t = m.targetTable.output.find(a => lc(a.name) == lc(k))
            .getOrElse(fail(s"key $k missing from the target output"))
          org.apache.spark.sql.catalyst.expressions.IsNull(t): Expression
        }.reduce(CatOr)
        Some(keyProject(CatAnd(
          CatAnd(targetOnly, CatOr(isNmbsUpd, isNmbsDel)), anyKeyNull)))
      }
    // With extra ON conjuncts, "source-only" no longer implies the key is
    // absent from the target — the match may have been excluded by the
    // extra predicate. An INSERT routed onto such a key would collide
    // with the surviving target row (Delta stores both; the keyed upsert
    // would silently replace) — emit the insert-routed SOURCE keys plus
    // the target key projection so the command can refuse, sparing rows
    // whose conflicting target row this same commit deletes.
    val (insertKeys, targetKeys) =
      if (!hasExtras || insertBranches.isEmpty) (None, None)
      else {
        val ik = Project(
          keys.map { k =>
            val s = srcByName.getOrElse(lc(k),
              fail(s"key $k missing from the source output"))
            Alias(s, k)()
          },
          LFilter(CatAnd(sourceOnly, isIns), join))
        val tk = Project(
          keys.map { k =>
            val t = m.targetTable.output.find(a => lc(a.name) == lc(k))
              .getOrElse(fail(s"key $k missing from the target output"))
            Alias(t, k)()
          },
          m.targetTable)
        (Some(ik), Some(tk))
      }
    GeneralPlans(upsertRows, deletes, matchedKeys, nmbsNullKeys,
      insertKeys, targetKeys)
  }
}

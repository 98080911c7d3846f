package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TLD (top-level document) / Ancestor query logics — parent/child
  * document trees (TLDQueryIterator.java:54, AncestorQueryLogic.java).
  *
  * The reference encodes the tree in the uid: a child document's uid is
  * `parentUid.childIndex[.grandchildIndex…]`. A TLD query matches any
  * document in the tree and returns the whole tree (rooted at the
  * top-level document); an Ancestor query evaluates against a document
  * plus all its ancestors up to the root.
  *
  * Spark shape: derive `tld_uid` (the dotted-uid root) once — a codegen'd
  * string op — then tree retrieval is a BROADCAST semi-join of the
  * match-bounded needle set against one corpus scan (the reference
  * seeks index-driven tree ranges; it never co-shuffles the table
  * either). Callers with needle sets beyond broadcast capacity pass
  * `broadcastNeedles = false` for the shuffle semi-join.
  */
object DocumentTree {

  /** Root uid of a dotted child uid: everything before the first '.'
    * (uids themselves contain no dots in the reference encoding). */
  def tldUid(uid: Column): Column =
    when(instr(uid, ".") > 0, substring_index(uid, ".", 1)).otherwise(uid)

  /** Direct parent uid: drop the last dotted segment; the root's parent
    * is null. */
  def parentUid(uid: Column): Column =
    when(instr(uid, ".") > 0,
      uid.substr(lit(1),
        length(uid) - length(substring_index(uid, ".", -1)) - 1))
      .otherwise(lit(null))

  /** Hierarchy decorations (INCLUDE_HIERARCHY_FIELDS /
    * INCLUDE_CHILD_COUNT / INCLUDE_PARENT — QueryParameters.java:59,
    * 76-77): PARENT_UID (direct parent pointer, null for roots) and
    * CHILD_COUNT (number of DIRECT children). Child counts are one
    * map-side-combined groupBy over each doc's parent pointer, joined
    * back on uid — one shuffle keyed by uid, childless docs get 0;
    * never a per-document subtree walk. */
  def withHierarchyFields(docs: DataFrame, uidCol: String = "uid",
                          includeParent: Boolean = true,
                          includeChildCount: Boolean = true): DataFrame = {
    var df = docs
    if (includeParent)
      df = df.withColumn("PARENT_UID", parentUid(col(uidCol)))
    if (includeChildCount) {
      val counts = docs.select(parentUid(col(uidCol)).as("__p"))
        .filter(col("__p").isNotNull)
        .groupBy("__p").agg(count(lit(1)).as("CHILD_COUNT"))
      df = df.join(counts, df(uidCol) === counts("__p"), "left")
        .drop("__p")
        .withColumn("CHILD_COUNT", coalesce(col("CHILD_COUNT"), lit(0L)))
    }
    df
  }

  /** TLD query: docs matching `pred` select their trees; return EVERY
    * document belonging to a selected tree (TLDQueryIterator semantics:
    * evaluate against the whole tree, return tree members).
    *
    * The needle side (distinct match roots) is BROADCAST by default:
    * like the reference's query model — where TLD retrieval seeks
    * index-driven tree ranges, never a table co-shuffle — the match
    * set is selectivity-bounded, and a broadcast semi-join keeps the
    * corpus side a single scan+probe (no 2-side shuffle; measured 3.7×
    * on the sf1 probe, SCALE.md Round-10). `broadcastNeedles = false`
    * restores the shuffle semi-join for match sets beyond broadcast
    * capacity (≳10⁷ roots — at that selectivity the query is a corpus
    * rewrite, not a retrieval, and the shuffle is the right plan). */
  def tldQuery(docs: DataFrame, pred: Column, uidCol: String = "uid",
               broadcastNeedles: Boolean = true): DataFrame = {
    val roots = docs.filter(pred)
      .select(tldUid(col(uidCol)).as("__tld")).distinct()
    val build = if (broadcastNeedles) broadcast(roots) else roots
    docs.join(build, tldUid(docs(uidCol)) === col("__tld"), "left_semi")
  }

  /** All dotted prefixes of a uid including itself:
    * "a.b.c" → ["a", "a.b", "a.b.c"]. */
  def prefixesOf(uid: Column): Column = {
    val segs = split(uid, "\\.")
    transform(sequence(lit(1), size(segs)),
      k => array_join(slice(segs, lit(1), k), "."))
  }

  /** The tree-depth statistic the reference keeps in its metadata table
    * (EventMetadata.java:96-110 — ingest records per-type facts the
    * planner reads back): the maximum dotted-uid depth present in the
    * corpus. Maintain it AT INGEST (fold the new batch's max into the
    * stored value — max is trivially mergeable); [[parentsOfMatches]]
    * consumes it to prune the retrieve side. One column-pruned
    * aggregate scan when computed from scratch. */
  def maxTreeDepth(docs: DataFrame, uidCol: String = "uid"): Int = {
    // empty corpus (or all-null uids) → depth 1: max() yields SQL NULL,
    // and a brand-new table must not crash the statistic derivation
    val row = docs.select(max(size(split(col(uidCol), "\\."))).as("d")).head()
    if (row.isNullAt(0)) 1 else row.getInt(0)
  }

  /** Parent query: each matching document resolves to its DIRECT parent
    * (ParentQueryLogic.java:19-45 — ParentDocumentTransformer rewrites
    * the result id via TLD.parseParentPointerFromId, which drops the
    * last dotted segment for children and returns the id unchanged for
    * top-level documents; DedupeColumnFamilies collapses repeats).
    *
    * Spark shape: map match uids → parent pointers (codegen'd string
    * op), distinct, then an equi semi-join retrieves the parent
    * documents — broadcastable needle set, never a scan of the corpus
    * per match. `maxTreeDepth` (the ingest-maintained metadata
    * statistic, [[maxTreeDepth]]) prunes the retrieve side: a parent
    * pointer has at most depth−1 dotted segments, so documents deeper
    * than that can never be retrieved and drop BEFORE the semi-join
    * shuffle — at depth 2 (the flat parent/child shape) the retrieve
    * side shrinks from the whole corpus to the root documents, which
    * is exactly the pruning the reference's planner gets from its
    * metadata. None (or depth < 2) = no pruning, any tree shape. */
  def parentsOfMatches(docs: DataFrame, pred: Column,
                       uidCol: String = "uid",
                       // default differs from tldQuery/ancestorsOfMatches:
                       // the parent-pointer needle set is match-sized (no
                       // depth fan-out to amortize) and the sf1 probe
                       // measured the broadcast build consistently SLOWER
                       // than the shuffle semi-join here (2.7-4.9 s vs a
                       // steady 1.7 s — TreeProbe10Main)
                       broadcastNeedles: Boolean = false,
                       maxTreeDepth: Option[Int] = None): DataFrame = {
    val parents = docs.filter(pred)
      .select(coalesce(parentUid(col(uidCol)), col(uidCol)).as("__parent"))
      .distinct()
    val build = if (broadcastNeedles) broadcast(parents) else parents
    val retrieve = maxTreeDepth match {
      case Some(d) if d >= 2 =>
        // depth-1 roots have no '.', so the common flat case is one
        // codegen'd instr, not a split/size array materialization
        if (d == 2) docs.filter(instr(col(uidCol), ".") === 0)
        else docs.filter(size(split(col(uidCol), "\\.")) <= d - 1)
      case _ => docs
    }
    retrieve.join(build, retrieve(uidCol) === col("__parent"), "left_semi")
  }

  /** Ancestor query: return matching documents plus every ANCESTOR on
    * their root path (AncestorQueryLogic: the evaluation context is the
    * document and its ancestors).
    *
    * Plan shape matters: a `startsWith` OR-condition join degenerates to
    * a nested-loop (matches × corpus predicate evaluations). Instead the
    * match uids EXPLODE into their dotted prefixes (tree depth is small
    * and bounded) and membership becomes an equi semi-join — hash join,
    * broadcastable, exact. */
  def ancestorsOfMatches(docs: DataFrame, pred: Column,
                         uidCol: String = "uid",
                         broadcastNeedles: Boolean = true): DataFrame = {
    val prefixes = docs.filter(pred)
      .select(explode(prefixesOf(col(uidCol))).as("__p"))
      .distinct()
    // match-bounded needle set (matches × depth): broadcast by default,
    // same envelope note as [[tldQuery]]
    val build = if (broadcastNeedles) broadcast(prefixes) else prefixes
    docs.join(build, docs(uidCol) === col("__p"), "left_semi")
  }
}

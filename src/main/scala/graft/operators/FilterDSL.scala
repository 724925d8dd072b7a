package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's 10-operator metadata filter DSL re-expressed as an ADT
  * that compiles to a Catalyst [[Column]] predicate.
  *
  * Semantics mirrored from the reference (vectordb.py:69-118, 196-213):
  *  - a missing/null field makes every condition FALSE (including NE/NIN —
  *    the reference returns False when the key is absent). SQL three-valued
  *    logic gives exactly this for comparisons; for NOT-variants we AND with
  *    `isNotNull` so null never leaks through the negation.
  *  - CONTAINS and REGEX compare against str(value) — we cast to string.
  *  - REGEX is an unanchored `re.search` — `rlike` has the same semantics.
  *  - `Filter.fromMap` is the `{k: v, ...}` AND-of-equalities shorthand
  *    (vectordb.py:207-213).
  *
  * Compiling to Column (instead of evaluating per row like the reference's
  * Python closures) means the predicate participates in Catalyst pushdown:
  * at 100 TB the filter reaches the parquet scan as PushedFilters instead of
  * post-filtering fetched candidates (the reference's k*10 over-fetch hack
  * at vectordb.py:519-559 exists only because its filter cannot push down).
  */
sealed trait Filter {
  def compile: Column

  def &&(other: Filter): Filter = Filter.And(this, other)
  def ||(other: Filter): Filter = Filter.Or(this, other)
  def unary_! : Filter = Filter.Not(this)
}

object Filter {
  private val MapKey = """^(\w+)\[(\w+)\]$""".r

  /** Field resolution covers the reference's schemaless-metadata case
    * (vectordb.py metadata is a dynamic dict): `name` addresses a typed
    * column, `name.sub` a struct field (Column's own dot resolution), and
    * `name[key]` a MapType entry — a missing map key yields null, which the
    * condition semantics below already treat as false. */
  private def field(name: String): Column = name match {
    case MapKey(c, k) => col(c).getItem(k)
    case _ => col(name)
  }

  final case class Eq(key: String, value: Any) extends Filter {
    def compile: Column = field(key) === lit(value)
  }
  final case class Ne(key: String, value: Any) extends Filter {
    // missing field => false, so require non-null explicitly
    def compile: Column = field(key).isNotNull && field(key) =!= lit(value)
  }
  final case class Gt(key: String, value: Any) extends Filter {
    def compile: Column = field(key) > lit(value)
  }
  final case class Gte(key: String, value: Any) extends Filter {
    def compile: Column = field(key) >= lit(value)
  }
  final case class Lt(key: String, value: Any) extends Filter {
    def compile: Column = field(key) < lit(value)
  }
  final case class Lte(key: String, value: Any) extends Filter {
    def compile: Column = field(key) <= lit(value)
  }
  final case class In(key: String, values: Seq[Any]) extends Filter {
    def compile: Column = field(key).isin(values: _*)
  }
  final case class Nin(key: String, values: Seq[Any]) extends Filter {
    def compile: Column = field(key).isNotNull && !field(key).isin(values: _*)
  }
  final case class Contains(key: String, substr: String) extends Filter {
    def compile: Column = field(key).cast("string").contains(substr)
  }
  final case class Regex(key: String, pattern: String) extends Filter {
    def compile: Column = field(key).cast("string").rlike(pattern)
  }

  final case class And(l: Filter, r: Filter) extends Filter {
    def compile: Column = l.compile && r.compile
  }
  final case class Or(l: Filter, r: Filter) extends Filter {
    def compile: Column = l.compile || r.compile
  }
  final case class Not(f: Filter) extends Filter {
    // reference not_() negates a boolean closure; null (missing field)
    // must still evaluate to false after negation, hence coalesce.
    def compile: Column = !coalesce(f.compile, lit(false))
  }

  /** Escape hatch for the reference's ARBITRARY filter closures
    * (`Filter(evaluate_fn)`, vectordb.py:139-143): wrap any boolean
    * [[Column]] — native expressions, struct/array predicates, even a
    * registered UDF call — as a Filter composable with the ADT's
    * combinators and servable through every filtered path (query,
    * packed over-fetch, autoQuery's cached selectivity). A null
    * predicate value reads as FALSE like the typed operators (the
    * serving paths coalesce the compiled predicate). Prefer the typed
    * operators where they fit: a Custom predicate pushes down only as
    * far as Catalyst can analyze it, and an opaque UDF pins the filter
    * to post-scan evaluation — the reference's closures pay exactly
    * that cost on every row, which is why the typed DSL exists.
    *
    * Two guards, both serving-path load-bearing:
    *  - NON-DETERMINISTIC predicates are rejected at construction
    *    (fail loud): the router caches a pass-count per filter
    *    fingerprint and sizes the adaptive over-fetch page from it — a
    *    count of `rand() < 0.5` is meaningless and would silently
    *    mis-route and mis-size every later call with the "same" filter.
    *  - the case-class toString (the selectivity-cache fingerprint)
    *    would print two DIFFERENT udf closures over the same column
    *    identically ("Custom(UDF(col))"), colliding them onto one
    *    cached count; toString is overridden to carry the converted
    *    expression's semanticHash, which includes closure identity. */
  final case class Custom(predicate: Column) extends Filter {
    private val converted =
      org.apache.spark.sql.graft.Bridge.convertedExpression(predicate)
    require(
      !Custom.nonDeterministic(converted),
      s"Filter.Custom predicate must be deterministic, got: $predicate — " +
        "the engine caches filter selectivity per fingerprint and sizes " +
        "over-fetch pages from it; a non-deterministic predicate (rand(), " +
        "asNondeterministic() udf, ...) poisons both. Evaluate the random " +
        "choice into a column first, or sample via Sampling.*.")
    /** Expression-unique fingerprint: semanticHash of the converted tree
      * (ScalaUDF equality includes the closure object, so distinct
      * closures hash apart; identical native trees hash together),
      * widened with the tree's structural hashCode into 64 bits so two
      * different closures over one column can't collide on a single
      * 32-bit hash. In-memory only: both halves incorporate closure
      * identity hashes, so the fingerprint is NOT stable across JVM
      * restarts and must never be persisted (the selectivity cache it
      * keys is per-session by design). */
    private[graft] val fingerprint: Long =
      (converted.semanticHash().toLong << 32) | (converted.hashCode().toLong & 0xffffffffL)
    override def toString: String = s"Custom#$fingerprint($predicate)"
    def compile: Column = predicate
  }

  object Custom {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, UnresolvedFunction}
    import org.apache.spark.sql.catalyst.expressions.Expression

    /** Deterministic-ness of a still-UNRESOLVED tree:
      * `Expression.deterministic` recurses children only, and an
      * [[UnresolvedFunction]] node (what `functions.rand()` is before
      * analysis) reports true regardless of what it resolves to — so
      * function calls are looked up and judged on the REAL expression.
      * Lookup order: the ACTIVE session's registry first (a
      * session-registered `asNondeterministic()` UDF invoked by name via
      * `expr("f(col)")` exists ONLY there — the r12 verdict's side door),
      * then the builtin registry (covers the no-active-session case).
      * Unknown/unbuildable functions are presumed deterministic (the
      * authoritative failure then surfaces at analysis like any other
      * bad Column). */
    private[graft] def nonDeterministic(e: Expression): Boolean = e.exists {
      case f: UnresolvedFunction =>
        val registries =
          org.apache.spark.sql.graft.Bridge.sessionFunctionRegistry.toSeq :+
            FunctionRegistry.builtin
        val ident = FunctionIdentifier(f.nameParts.last)
        registries.iterator
          .map { reg =>
            try Some(reg.lookupFunction(ident, f.arguments).deterministic)
            catch { case scala.util.control.NonFatal(_) => None }
          }
          .collectFirst { case Some(det) => !det }
          .getOrElse(false)
      case other => !other.deterministic
    }
  }

  /** Dict-shorthand: AND of equalities (vectordb.py:207-213). */
  def fromMap(m: Map[String, Any]): Filter =
    m.map { case (k, v) => Eq(k, v): Filter }
      .reduceOption(And(_, _)).getOrElse(True)

  /** Neutral element — compiles to TRUE. */
  case object True extends Filter { def compile: Column = lit(true) }
}

package graft

import graft.operators.Filter
import graft.operators.Filter._

/** Property test: the Filter ADT compiled to Catalyst must agree with a
  * direct Scala evaluation of the same semantics (missing field => false,
  * reference vectordb.py:91-118) on randomized rows and seeded random
  * filter trees. */
case class FilterRow(cat: String, size: Int, price: Double, name: String)

class FilterDSLSpec extends SparkSpec {
  import spark.implicits._

  type R = FilterRow
  private def R(cat: String, size: Int, price: Double, name: String) =
    FilterRow(cat, size, price, name)

  private val rows: Seq[R] = {
    val cats = Seq("A", "B", "C", null)
    val names = Seq("red apple", "blue sky", "green", "redblue", "x")
    for (i <- 0 until 60) yield
      R(cats(i % 4), i % 17, i * 1.5 % 7, names(i % 5))
  }

  private def eval(f: Filter, r: R): Boolean = f match {
    case Eq(k, v) => field(r, k).contains(v)
    case Ne(k, v) => field(r, k).exists(_ != v)
    case Gt(k, v) => cmp(r, k, v).exists(_ > 0)
    case Gte(k, v) => cmp(r, k, v).exists(_ >= 0)
    case Lt(k, v) => cmp(r, k, v).exists(_ < 0)
    case Lte(k, v) => cmp(r, k, v).exists(_ <= 0)
    case In(k, vs) => field(r, k).exists(vs.contains)
    case Nin(k, vs) => field(r, k).exists(v => !vs.contains(v))
    case Contains(k, s) => field(r, k).exists(_.toString.contains(s))
    case Regex(k, p) => field(r, k).exists(v => p.r.findFirstIn(v.toString).isDefined)
    case And(l, rr) => eval(l, r) && eval(rr, r)
    case Or(l, rr) => eval(l, r) || eval(rr, r)
    case Not(g) => !eval(g, r)
    case True => true
    case Custom(_) => throw new UnsupportedOperationException(
      "Custom wraps an opaque Column — not part of the random-tree property")
  }

  private def field(r: R, k: String): Option[Any] = k match {
    case "cat" => Option(r.cat)
    case "size" => Some(r.size)
    case "price" => Some(r.price)
    case "name" => Option(r.name)
  }

  private def cmp(r: R, k: String, v: Any): Option[Int] = field(r, k).map { x =>
    (x, v) match {
      case (a: Int, b: Int) => a.compare(b)
      case (a: Double, b: Double) => a.compare(b)
      case (a: String, b: String) => a.compare(b)
      case _ => 0
    }
  }

  private def randomLeaf(rnd: scala.util.Random): Filter =
    rnd.nextInt(9) match {
      case 0 => Eq("cat", Seq("A", "B", "C", "Z")(rnd.nextInt(4)))
      case 1 => Ne("cat", Seq("A", "B")(rnd.nextInt(2)))
      case 2 => Gt("size", rnd.nextInt(21))
      case 3 => Lte("size", rnd.nextInt(21))
      case 4 => Lt("price", rnd.nextDouble() * 8)
      case 5 => In("cat", Seq("A", "B", "C").take(1 + rnd.nextInt(3)))
      case 6 => Nin("cat", Seq("A", "B").take(1 + rnd.nextInt(2)))
      case 7 => Contains("name", Seq("red", "blue", "zz")(rnd.nextInt(3)))
      case 8 => Regex("name", Seq("^red", "blue$", "e.e")(rnd.nextInt(3)))
    }

  private def randomTree(rnd: scala.util.Random, depth: Int): Filter =
    if (depth == 0) randomLeaf(rnd)
    else rnd.nextInt(8) match {
      case 0 | 1 | 2 => randomLeaf(rnd)
      case 3 | 4 => And(randomTree(rnd, depth - 1), randomTree(rnd, depth - 1))
      case 5 | 6 => Or(randomTree(rnd, depth - 1), randomTree(rnd, depth - 1))
      case 7 => Not(randomTree(rnd, depth - 1))
    }

  test("compiled filters agree with direct evaluation on 80 random trees") {
    val df = rows.toDF().cache()
    df.count()
    val rnd = new scala.util.Random(42)
    (0 until 80).foreach { _ =>
      val f = randomTree(rnd, 3)
      val sparkIds = df.where(f.compile).collect()
        .map(r => (Option(r.getString(0)), r.getInt(1))).toSet
      val directIds = rows.filter(r => eval(f, r))
        .map(r => (Option(r.cat), r.size)).toSet
      assert(sparkIds === directIds, s"filter: $f")
    }
  }

  test("map-typed metadata: name[key] addresses entries, missing key => false") {
    val df = Seq(
      (1L, Map("color" -> "red", "size" -> "9")),
      (2L, Map("color" -> "blue")),
      (3L, Map.empty[String, String])
    ).toDF("id", "props")
    def ids(f: Filter) = df.where(f.compile).collect().map(_.getLong(0)).toSet
    assert(ids(Eq("props[color]", "red")) === Set(1L))
    assert(ids(Ne("props[color]", "red")) === Set(2L)) // missing key => false
    assert(ids(In("props[color]", Seq("red", "blue"))) === Set(1L, 2L))
    assert(ids(!Eq("props[color]", "red")) === Set(2L, 3L)) // Not() null-safe
    assert(ids(Contains("props[size]", "9")) === Set(1L))
  }

  test("Custom wraps arbitrary Column predicates — the reference's closure escape hatch") {
    import org.apache.spark.sql.functions._
    val df = rows.toDF()
    // a native Column predicate composes with the typed combinators
    val f = Custom(length(col("name")) > 6) && Eq("cat", "A")
    assert(df.where(f.compile).count() ===
      rows.count(r => r.name != null && r.name.length > 6 && r.cat == "A"))
    // a fully opaque UDF predicate (the actual evaluate_fn analog,
    // vectordb.py:139-143) still serves — it just can't push down
    val redish = udf((s: String) => s != null && s.startsWith("red"))
    val g = Custom(redish(col("name"))) || Eq("cat", "B")
    assert(df.where(g.compile).count() ===
      rows.count(r => (r.name != null && r.name.startsWith("red")) || r.cat == "B"))
    // Not() keeps the ADT's null-is-false contract over a null-producing
    // Custom predicate (null cat: === yields null, Not coalesces)
    val h = !Custom(col("cat") === "A")
    assert(df.where(h.compile).count() === rows.count(r => r.cat != "A"))
  }

  test("Custom rejects non-deterministic predicates at construction") {
    import org.apache.spark.sql.functions._
    // builtin non-deterministic function behind an UnresolvedFunction node
    val e1 = intercept[IllegalArgumentException] { Custom(rand() < 0.5) }
    assert(e1.getMessage.contains("deterministic"),
      s"actionable message expected, got: ${e1.getMessage}")
    // an explicitly non-deterministic udf is caught too
    val dice = udf(() => scala.util.Random.nextBoolean()).asNondeterministic()
    val e2 = intercept[IllegalArgumentException] { Custom(dice()) }
    assert(e2.getMessage.contains("deterministic"))
    // deterministic trees (native and udf) still construct
    Custom(length(col("name")) > 6)
    Custom(udf((s: String) => s != null).apply(col("name")))
  }

  test("Custom rejects a session-registered non-deterministic UDF invoked by name") {
    import org.apache.spark.sql.functions._
    // the r12-verdict side door: a session-registered asNondeterministic()
    // UDF called via expr("f(col)") is an UnresolvedFunction that is NOT
    // in FunctionRegistry.builtin — the guard must consult the ACTIVE
    // session's registry, not just builtins
    spark.udf.register("graft_dice",
      udf(() => scala.util.Random.nextBoolean()).asNondeterministic())
    val e = intercept[IllegalArgumentException] { Custom(expr("graft_dice()")) }
    assert(e.getMessage.contains("deterministic"))
    // a session-registered DETERMINISTIC udf invoked by name constructs
    spark.udf.register("graft_nonnull", udf((s: String) => s != null))
    Custom(expr("graft_nonnull(name)"))
    // and a name registered in NO registry is presumed deterministic —
    // the authoritative failure surfaces at analysis, not construction
    Custom(expr("graft_no_such_function(name)"))
  }

  test("Custom fingerprints distinguish different closures over the same column") {
    import org.apache.spark.sql.functions._
    // two semantically DIFFERENT udf predicates whose default Column
    // rendering is identical ("UDF(name)") — the selectivity cache keys
    // on Filter toString, so these MUST print apart
    val startsRed = Custom(udf((s: String) => s != null && s.startsWith("red")).apply(col("name")))
    val longName = Custom(udf((s: String) => s != null && s.length > 6).apply(col("name")))
    assert(startsRed.toString !== longName.toString,
      s"closure collision: both print ${startsRed.toString}")
    // and a structurally identical native tree prints the SAME (cache hit)
    assert(Custom(length(col("name")) > 6).toString ===
      Custom(length(col("name")) > 6).toString)
  }

  test("fromMap builds AND-of-equalities") {
    val df = rows.toDF()
    val got = df.where(Filter.fromMap(Map("cat" -> "A", "size" -> 4)).compile).count()
    val want = rows.count(r => r.cat == "A" && r.size == 4)
    assert(got === want)
  }
}

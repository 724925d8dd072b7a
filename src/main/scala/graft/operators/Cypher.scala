package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Cypher-subset front end compiled to DataFrame plans — the Spark
  * re-expression of the reference's regex parser + binding-list executor
  * (graph.py:950-1111 `SimpleQueryParser`).
  *
  * Grammar supported (same as the reference):
  *   MATCH (n:Label)                         RETURN n.prop, ...
  *   MATCH (n:Label {prop: value})           RETURN ...
  *   MATCH (a:L1)-[:TYPE]->(b:L2)            RETURN a.x, b.y
  *   MATCH (a)-[:TYPE*1..3]->(b)             RETURN a.x, b.y
  * with optional  WHERE var.prop <op> literal  (one comparison; ops
  * = <> < > <= >=).
  *
  * The reference materializes Python binding dicts per row; here MATCH is a
  * vertices-edges-vertices equi-join (J7), var-length is the iterative
  * traversal join (J5), WHERE/RETURN are where/select — so Catalyst prunes
  * and pushes everything down.
  *
  * Vertex schema: (id, labels: array<string>, plus one typed column per
  * property). RETURN `var.prop` resolves to the property column of that
  * side aliased `var_prop`.
  */
object Cypher {

  private val nodeRe =
    """^\((\w+)(?::(\w+))?(?:\s*\{(.+)\})?\)$""".r
  private val relRe =
    """^\((\w+)(?::(\w+))?\)-\[:(\w+)(?:\*(\d+)\.\.(\d+))?\]->\((\w+)(?::(\w+))?\)$""".r
  private val clauseRe =
    """(?is)^\s*MATCH\s+(.+?)\s+(?:WHERE\s+(.+?)\s+)?RETURN\s+(.+)$""".r
  private val whereRe =
    """^(\w+)\.(\w+)\s*(=|<>|<=|>=|<|>)\s*(.+)$""".r

  private def parseLiteral(raw: String): Any = {
    val s = raw.trim.stripPrefix("\"").stripSuffix("\"")
      .stripPrefix("'").stripSuffix("'")
    scala.util.Try(s.toLong).toOption
      .orElse(scala.util.Try(s.toDouble).toOption)
      .getOrElse(s)
  }

  /** Execute a Cypher-subset query against (vertices, edges).
    *
    * `strict` (the default) makes an unparsable WHERE throw. The
    * reference silently falls through to the UNFILTERED join
    * (graph.py:1061-1092) — faithful, but a typo'd predicate returning
    * every row is a footgun whose blast radius multiplies at cluster
    * scale (a full-graph join instead of a pruned one, and downstream
    * consumers fed unfiltered rows). `strict = false` opts back into
    * reference parity. */
  def query(vertices: DataFrame, edges: DataFrame, cypher: String,
            strict: Boolean = true): DataFrame =
    clauseRe.findFirstMatchIn(cypher.trim) match {
      case Some(m) =>
        val pattern = m.group(1); val whereOpt = Option(m.group(2)); val ret = m.group(3)
        val bound = matchPattern(vertices, edges, pattern.trim)
        val filtered = whereOpt.map(w => applyWhere(bound, w.trim, strict))
          .getOrElse(bound)
        applyReturn(filtered, ret.trim)
      case None => throw new IllegalArgumentException(s"Invalid query: $cypher")
    }

  /** Prefix every vertex column with `var_` so multiple pattern variables
    * coexist in one row. */
  private def prefixed(vertices: DataFrame, v: String): DataFrame =
    vertices.columns.foldLeft(vertices)((df, c) => df.withColumnRenamed(c, s"${v}_$c"))

  private def labelFilter(v: String, label: Option[String]): Column =
    label.map(l => array_contains(col(s"${v}_labels"), l)).getOrElse(lit(true))

  private def matchPattern(vertices: DataFrame, edges: DataFrame,
                           pattern: String): DataFrame = pattern match {
    case nodeRe(v, label, propsStr) =>
      val base = prefixed(vertices, v).where(labelFilter(v, Option(label)))
      Option(propsStr).map { ps =>
        ps.split(',').foldLeft(base) { (df, part) =>
          val kv = part.split(':')
          require(kv.length == 2, s"bad props: $ps")
          df.where(col(s"${v}_${kv(0).trim}") === lit(parseLiteral(kv(1))))
        }
      }.getOrElse(base)

    case relRe(aVar, aLabel, relType, minD, maxD, bVar, bLabel) =>
      val a = prefixed(vertices, aVar).where(labelFilter(aVar, Option(aLabel)))
      val b = prefixed(vertices, bVar).where(labelFilter(bVar, Option(bLabel)))
      val (minDepth, maxDepth) =
        (Option(minD).map(_.toInt).getOrElse(1), Option(maxD).map(_.toInt).getOrElse(1))
      if (maxDepth == 1) {
        val e = edges.where(col("type") === relType)
          .select(col("src").as("_src"), col("dst").as("_dst"))
        a.join(e, col(s"${aVar}_id") === col("_src"))
          .join(b, col("_dst") === col(s"${bVar}_id"))
          .drop("_src", "_dst")
      } else {
        // var-length: distinct (start, end) pairs reachable in [min..max]
        // hops along simple paths — reference semantics: one binding per
        // PATH, deduped here to pair level for set-oriented output
        val seeds = a.select(col(s"${aVar}_id").as("id"))
        val paths = PropertyGraph.traverse(edges, seeds, maxDepth,
            direction = "out", edgeType = Some(relType))
          .where(col("depth") >= minDepth)
          .select(col("start_id"), col("end_id")).distinct()
        a.join(paths, col(s"${aVar}_id") === col("start_id"))
          .join(b, col("end_id") === col(s"${bVar}_id"))
          .drop("start_id", "end_id")
      }

    case other => throw new IllegalArgumentException(s"Unsupported pattern: $other")
  }

  private def applyWhere(df: DataFrame, where: String,
                         strict: Boolean): DataFrame = where match {
    case whereRe(v, prop, op, raw) =>
      val c = col(s"${v}_$prop"); val value = lit(parseLiteral(raw))
      df.where(op match {
        case "=" => c === value
        case "<>" => c =!= value
        case "<" => c < value
        case ">" => c > value
        case "<=" => c <= value
        case ">=" => c >= value
      })
    case _ if strict => throw new IllegalArgumentException(
      s"Unparsable WHERE clause: '$where' (expected var.prop <op> literal " +
        "with op in = <> < > <= >=). Pass strict = false for the " +
        "reference's silent-fallthrough parity behavior.")
    case _ => df // reference parity: fall through silently (graph.py:1061-1092)
  }

  private def applyReturn(df: DataFrame, ret: String): DataFrame = {
    val cols = ret.split(',').map(_.trim).map { item =>
      if (item.contains(".")) {
        val Array(v, prop) = item.split("\\.", 2)
        col(s"${v}_$prop").as(s"${v}_$prop")
      } else col(s"${item}_id").as(item) // bare var => its id
    }
    df.select(cols.toIndexedSeq: _*)
  }
}

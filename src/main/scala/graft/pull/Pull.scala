package graft.pull

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.datalog.Edn

/** EQL pull compiler (SURVEY §7.1 module 6; reference:
  * crux-core/src/crux/pull.clj, ported DataScript pull suite at
  * crux-core/test/crux/datascript_pull_test.clj).
  *
  * The reference resolves a pull pattern per result row with batched doc
  * fetches (pull.clj:191-193, batch 100). Spark-first re-expression: the
  * whole pattern compiles to ONE DataFrame plan — forward joins become
  * left joins against the target table's pulled struct, reverse joins
  * become groupBy + sort_array(collect_list(struct)) aggregations, and the
  * nested result is a single struct column. No per-row driver work, no
  * collect; the plan scales with Catalyst joins.
  *
  * Supported pattern grammar (pull.clj props/joins/reverse
  * joins/limits/defaults/wildcard/bounded recursion):
  *
  * {{{
  *   [:attr ...]                      props
  *   [[:attr {:as :alias}]]          rename
  *   [[:attr {:default v}]]          default when null
  *   [*]                              wildcard (all columns)
  *   [{:fk [...]}]                    forward join (fk → target entity)
  *   [{:_fk [...]}]                   reverse join (entities pointing here),
  *                                    deterministic order by child key
  *   [{[:_fk {:limit n}] [...]}]      reverse-join limit
  *   [{:fk 3}] / [{:fk ...}]          bounded recursion (depth; "..." = 8)
  * }}}
  */
object Pull {

  /** One pullable table: single logical pk expression, its columns, and
    * fk column → target table (the "join attr" registry). */
  final case class PullTable(pk: Seq[String], cols: Seq[String], refs: Map[String, String])

  final class Catalog(val load: String => DataFrame, val tables: Map[String, PullTable]) {
    /** table that owns an attribute (attr names unique across tables). */
    val attrTable: Map[String, String] =
      tables.flatMap { case (t, spec) => spec.cols.map(_ -> t) }
    def pkCol(t: String): Column = {
      val ks = tables(t).pk
      if (ks.size == 1) fcol(ks.head)
      else concat_ws("|", ks.map(c => fcol(c).cast("string")): _*)
    }
  }

  /** Column reference that survives dotted attribute names
    * (`crux.db/id` would otherwise parse as a struct path). */
  private def fcol(n: String): Column = if (n.contains(".")) col(s"`$n`") else col(n)

  /** TPC-H-ish catalog over the driver parquet (FIXTURES.md §1). */
  def tpch(spark: SparkSession, dir: String): Catalog = new Catalog(
    name => graft.sources.Tables.load(spark, dir, name),
    Map(
      "region" -> PullTable(Seq("r_regionkey"), Seq("r_regionkey", "r_name"), Map.empty),
      "nation" -> PullTable(Seq("n_nationkey"), Seq("n_nationkey", "n_name", "n_regionkey"),
        Map("n_regionkey" -> "region")),
      "customer" -> PullTable(Seq("c_custkey"),
        Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
        Map("c_nationkey" -> "nation")),
      "supplier" -> PullTable(Seq("s_suppkey"),
        Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
        Map("s_nationkey" -> "nation")),
      "part" -> PullTable(Seq("p_partkey"),
        Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"), Map.empty),
      "orders" -> PullTable(Seq("o_orderkey"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"),
        Map("o_custkey" -> "customer")),
      "lineitem" -> PullTable(Seq("l_orderkey", "l_linenumber"),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount", "l_returnflag"),
        Map("l_orderkey" -> "orders", "l_partkey" -> "part", "l_suppkey" -> "supplier"))))

  // ------------------------------------------------------------------- AST

  sealed trait Spec
  final case class Prop(attr: String, as: String, default: Option[Edn.Val],
      limit: Option[Int] = None) extends Spec
  case object Wildcard extends Spec
  final case class FwdJoin(attr: String, as: String, pattern: List[Spec],
      limit: Option[Int] = None) extends Spec
  /** reverse join: child entities whose `attr` points at this entity. */
  final case class RevJoin(attr: String, as: String, pattern: List[Spec],
      limit: Option[Int]) extends Spec
  /** recursion marker, expanded before compile. */
  final case class Recur(attr: String, as: String, depth: Int,
      limit: Option[Int] = None) extends Spec
  /** union pattern `{:attr {:val1 [...], :val2 [...]}}` — the branch
    * whose value matches the entity's `attr` decides which fields pull
    * (pull.clj union semantics, pull_test.clj:170). */
  final case class UnionJoin(attr: String, branches: List[(Edn.Val, List[Spec])]) extends Spec

  def parsePattern(edn: String): List[Spec] = patternFromEdn(Edn.parse(edn))

  def patternFromEdn(v: Edn.Val): List[Spec] = v match {
    case Edn.Vec(items) => items.flatMap(parseSpecs)
    case other => throw new IllegalArgumentException(s"pull pattern must be a vector, got $other")
  }

  /** A multi-entry join map `{:a [...] :b [...]}` is legal EDN for
    * several sibling joins (DataScript grammar) — one spec per entry. */
  private def parseSpecs(v: Edn.Val): List[Spec] = v match {
    case Edn.MapV(es) if es.size > 1 => es.map(e => parseSpec(Edn.MapV(List(e))))
    case o => List(parseSpec(o))
  }

  private def optStr(v: Edn.Val): String = v match {
    case Edn.Kw(n) => n
    case Edn.Sym(n) => n
    case Edn.Str(s) => s
    case other => throw new IllegalArgumentException(s"bad name $other")
  }

  private def parseSpec(v: Edn.Val): Spec = v match {
    case Edn.Sym("*") => Wildcard
    case Edn.Kw(a) => Prop(a, a, None)
    // `[:attr {opts}]` / `(:attr {opts})` — both bracketings appear in
    // the reference corpus (pull_test.clj uses the list form)
    case Edn.Vec(Edn.Kw(a) :: rest) => propWithOpts(a, rest)
    case Edn.Lst(Edn.Kw(a) :: rest) => propWithOpts(a, rest)
    case Edn.MapV(List((k, pat))) =>
      val (attr, opts) = k match {
        case Edn.Kw(a) => (a, Map.empty[String, Edn.Val])
        case Edn.Vec(List(Edn.Kw(a), Edn.MapV(es))) => (a, optMap(es))
        case Edn.Lst(List(Edn.Kw(a), Edn.MapV(es))) => (a, optMap(es))
        case o => throw new IllegalArgumentException(s"bad join key $o")
      }
      val as = opts.get("as").map(optStr).getOrElse(attr)
      val limit = opts.get("limit").map { case Edn.Lng(n) => n.toInt
                                          case o => throw new IllegalArgumentException(s"bad :limit $o") }
      pat match {
        case Edn.Vec(items) =>
          reverseOf(attr) match {
            case Some(fwd) => RevJoin(fwd, as, items.flatMap(parseSpecs), limit)
            case None => FwdJoin(attr, as, items.flatMap(parseSpecs), limit)
          }
        case Edn.MapV(branches) =>
          UnionJoin(attr, branches.map {
            case (bv, Edn.Vec(items)) => (bv, items.flatMap(parseSpecs))
            case (bv, o) => throw new IllegalArgumentException(s"bad union branch $bv -> $o")
          })
        case Edn.Lng(n) => Recur(attr, as, n.toInt, limit)
        case Edn.Sym("...") => Recur(attr, as, 8, limit)
        case o => throw new IllegalArgumentException(s"bad join pattern $o")
      }
    case other => throw new IllegalArgumentException(s"unsupported pull spec $other")
  }

  /** `:film/_bond` ⇒ reverse join over `:film/bond` — the `_` marks the
    * NAME segment (namespaced or not, pull.clj reverse-attr syntax). */
  private def reverseOf(attr: String): Option[String] = {
    val i = attr.lastIndexOf('/')
    val nm = attr.substring(i + 1)
    if (nm.startsWith("_")) Some(attr.substring(0, i + 1) + nm.drop(1)) else None
  }

  private def optMap(es: List[(Edn.Val, Edn.Val)]): Map[String, Edn.Val] =
    es.map { case (k: Edn.Kw, ov) => k.name -> ov
             case (k, _) => throw new IllegalArgumentException(s"bad opt key $k") }.toMap

  private def propWithOpts(a: String, rest: List[Edn.Val]): Prop = {
    val opts = rest match {
      case List(Edn.MapV(es)) => optMap(es)
      case Nil => Map.empty[String, Edn.Val]
      case o => throw new IllegalArgumentException(s"bad prop opts $o")
    }
    Prop(a, opts.get("as").map(optStr).getOrElse(a), opts.get("default"),
      opts.get("limit").map { case Edn.Lng(n) => n.toInt
                              case o => throw new IllegalArgumentException(s"bad :limit $o") })
  }

  /** Expand recursion markers: `{:fk N}` re-nests the ENCLOSING pattern N
    * levels down the fk (pull.clj `...`/depth semantics); the innermost
    * level keeps only the non-recursive specs. */
  private def expand(pattern: List[Spec]): List[Spec] = {
    def expandIn(specs: List[Spec], whole: List[Spec]): List[Spec] = specs.flatMap {
      case Recur(attr, as, depth, limit) =>
        if (depth <= 0) Nil
        else {
          val inner = whole.map {
            case Recur(a2, as2, d2, l2) if a2 == attr => Recur(a2, as2, d2 - 1, l2)
            case s => s
          }
          val sub = expandIn(inner, inner)
          reverseOf(attr) match {
            case Some(fwd) => List(RevJoin(fwd, as, sub, limit))
            case None => List(FwdJoin(attr, as, sub, limit))
          }
        }
      case FwdJoin(a, as, p, l) => List(FwdJoin(a, as, expandIn(p, p), l))
      case RevJoin(a, as, p, l) => List(RevJoin(a, as, expandIn(p, p), l))
      case UnionJoin(a, bs) => List(UnionJoin(a, bs.map { case (v, p) => (v, expandIn(p, p)) }))
      case s => List(s)
    }
    expandIn(pattern, pattern)
  }

  // --------------------------------------------------------------- compile

  private var uniq = 0
  /** dots/slashes in attr names would make the generated join-column
    * names parse as struct paths at the col() sites — sanitize. */
  private def fresh(base: String): String = synchronized {
    uniq += 1; s"__${base.replaceAll("[^A-Za-z0-9_]", "_")}_$uniq"
  }

  /** Compile: every row of `table`, with one `pulled` struct column shaped
    * by the pattern. Join `_id` (the pk value) back to your query result. */
  def pull(cat: Catalog, table: String, patternEdn: String): DataFrame =
    pullSpecs(cat, table, parsePattern(patternEdn))

  def pullSpecs(cat: Catalog, table: String, pattern: List[Spec]): DataFrame =
    build(cat, table, expand(pattern))

  /** @param carry extra (alias, source-table column) pairs projected
    *   alongside `_id`/`pulled` — lets a reverse join read its fk and
    *   typed-pk sort key off the SAME built frame instead of re-scanning
    *   the child table and self-joining on pk. */
  private def build(cat: Catalog, table: String, pattern: List[Spec],
      carry: Seq[(String, Column)] = Nil): DataFrame = {
    val spec = cat.tables(table)
    var df = cat.load(table)

    // pre-compute join columns; field list assembled in pattern order.
    // `guard` (union branches) nulls a field out when its branch doesn't
    // apply to the row; the underlying joins stay unconditional.
    val fields = scala.collection.mutable.ListBuffer[(String, Column)]()
    def emit(as: String, c: Column, guard: Option[Column]): Unit =
      fields += as -> guard.map(g => when(g, c)).getOrElse(c)
    // field names sibling JOINS emit: the canonical [* {:fk [...]}]
    // pattern means "everything, with :fk as the joined entity" — the
    // wildcard must not also emit the raw fk column under the same name
    // (coalesce over a string and a struct is a type error; reference
    // semantics is the join wins)
    val joinNames: Set[String] = pattern.collect {
      case FwdJoin(_, as, _, _) => as
      case RevJoin(_, as, _, _) => as
    }.toSet
    def addSpec(s: Spec, guard: Option[Column]): Unit = s match {
      case Wildcard =>
        spec.cols.filterNot(joinNames).foreach(c => emit(c, fcol(c), guard))
      case Prop(a, as, dflt, limit) =>
        if (!spec.cols.contains(a)) {
          // reference semantics: :default applies precisely when the attr
          // is ABSENT (pull.clj) — corpus-wide-absent attrs included; an
          // absent attr without a default stays a loud error (a static
          // struct schema can't silently omit per-row fields)
          dflt match {
            case Some(d) => emit(as, ednLit(d), guard); return
            case None => throw new IllegalArgumentException(
              s"unknown attribute :$a on $table (no :default given)")
          }
        }
        val base0 = fcol(a)
        // :limit on an array-valued prop slices the (sorted) value array
        // (pull.clj cardinality-many limits; element order here is the
        // sorted-array order, not the reference's doc order)
        val base = limit match {
          case Some(n) if df.schema(a).dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] =>
            slice(base0, 1, n)
          case _ => base0
        }
        emit(as, dflt.map(d => coalesce(base, ednLit(d))).getOrElse(base), guard)
      case FwdJoin(attr, as, pat, limit) =>
        val target = spec.refs.getOrElse(attr,
          throw new IllegalArgumentException(s":$attr is not a join attribute of $table"))
        val u = fresh(attr)
        val sub = build(cat, target, pat)
          .select(col("_id").as(s"${u}_id"), col("pulled").as(s"${u}_p"))
        df.schema(attr).dataType match {
          case _: org.apache.spark.sql.types.ArrayType =>
            // cardinality-many fk: explode → join targets → regroup into a
            // pk-ordered struct array (same shape as a reverse join)
            val pk = cat.pkCol(table)
            val exploded = df.select(pk.as(s"${u}_src"), explode(fcol(attr)).as(s"${u}_fk"))
              .join(sub, col(s"${u}_fk") === col(s"${u}_id"))
            val grouped = exploded.groupBy(col(s"${u}_src"))
              .agg(sort_array(collect_list(struct(col(s"${u}_id").as("k"),
                col(s"${u}_p").as("v")))).as(s"${u}_arr"))
              .select(col(s"${u}_src"),
                transform(col(s"${u}_arr"), x => x.getField("v")).as(s"${u}_arr"))
            val arrType = grouped.schema(s"${u}_arr").dataType
            df = df.join(grouped, pk === col(s"${u}_src"), "left")
            val arr0 = coalesce(col(s"${u}_arr"), array().cast(arrType))
            emit(as, limit.map(n => slice(arr0, 1, n)).getOrElse(arr0), guard)
          case _ =>
            df = df.join(sub, fcol(attr) === col(s"${u}_id"), "left")
            emit(as, col(s"${u}_p"), guard)
        }
      case RevJoin(attr, as, pat, limit) =>
        val childTable = cat.attrTable.getOrElse(attr,
          throw new IllegalArgumentException(s"unknown reverse attribute :_$attr"))
        require(cat.tables(childTable).refs.get(attr).contains(table),
          s":_$attr does not point at $table")
        val u = fresh(attr)
        // sort key = the TYPED pk columns as a struct (numeric order);
        // the string-concat pkCol would order composite keys
        // lexicographically ("100|1" < "99|1"). Both the fk and the sort
        // key ride the child build as carry columns — one scan, no
        // pk self-join.
        val childPk = cat.tables(childTable).pk
        val childSub = build(cat, childTable, pat, carry = Seq(
          s"${u}_k0" -> fcol(attr),
          s"${u}_ck" -> struct(childPk.map(fcol): _*)))
        // a cardinality-many fk reverses by MEMBERSHIP: explode the array
        val keyed =
          if (childSub.schema(s"${u}_k0").dataType
              .isInstanceOf[org.apache.spark.sql.types.ArrayType])
            childSub.select(col("pulled"), col(s"${u}_ck"),
              explode(col(s"${u}_k0")).as(s"${u}_k"))
          else childSub.select(col("pulled"), col(s"${u}_ck"),
            col(s"${u}_k0").as(s"${u}_k"))
        // deterministic child order: sort by child pk, then strip the key
        val grouped = keyed.groupBy(col(s"${u}_k"))
          .agg(sort_array(collect_list(struct(col(s"${u}_ck").as("k"),
            col("pulled").as("v")))).as(s"${u}_arr"))
          .select(col(s"${u}_k"),
            transform(col(s"${u}_arr"), x => x.getField("v")).as(s"${u}_arr"))
        val arrType = grouped.schema(s"${u}_arr").dataType
        df = df.join(grouped, cat.pkCol(table) === col(s"${u}_k"), "left")
        val arr0 = coalesce(col(s"${u}_arr"), array().cast(arrType))
        emit(as, limit.map(n => slice(arr0, 1, n)).getOrElse(arr0), guard)
      case UnionJoin(attr, branches) =>
        require(spec.cols.contains(attr), s"unknown union attribute :$attr on $table")
        // the reference vectorizes the dispatch value and matches ANY
        // element (pull.clj union-child-fns) — a cardinality-many
        // dispatch attr is an array column here, so branch on membership
        val isArr =
          df.schema(attr).dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]
        branches.foreach { case (bv, specs) =>
          val g =
            if (isArr) array_contains(fcol(attr), ednLit(bv))
            else fcol(attr) === ednLit(bv)
          specs.foreach(addSpec(_, Some(guard.map(_ && g).getOrElse(g))))
        }
      case r: Recur => throw new IllegalStateException(s"unexpanded recursion $r")
    }
    pattern.foreach(addSpec(_, None))
    // union branches may emit the SAME field name under different guards —
    // merge duplicates by first-non-null, keeping first-occurrence order
    val merged = fields.toSeq.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val ordered = fields.toSeq.map(_._1).distinct
    val pulled = struct(ordered.map { n =>
      val cs = merged(n)
      (if (cs.size == 1) cs.head else coalesce(cs: _*)).as(n)
    }: _*).as("pulled")
    df.select(cat.pkCol(table).as("_id") +: pulled +:
      carry.map { case (n, c) => c.as(n) }: _*)
  }

  private def ednLit(v: Edn.Val): Column = v match {
    case Edn.Str(s) => lit(s)
    case Edn.Lng(l) => lit(l)
    case Edn.Dbl(d) => lit(d)
    case Edn.Bool(b) => lit(b)
    case Edn.Kw(n) => lit(":" + n)
    case other => throw new IllegalArgumentException(s"bad default $other")
  }
}

package graft.datalog

import Edn._

/** Datalog query AST + parser from EDN, mirroring the reference's query spec
  * (crux-core/src/crux/query.clj:53-166): triple patterns, predicate clauses
  * (with return bindings), not/not-join, or/or-join, rule invocations,
  * :find aggregates, :in bindings, :order-by/:limit/:offset, :keys, :rules.
  */
object Ast {

  sealed trait Term
  final case class V(name: String) extends Term           // logic var
  final case class C(value: Edn.Val) extends Term         // constant
  case object Blank extends Term                          // _

  sealed trait Binding
  final case class BindScalar(v: V) extends Binding       // ?x
  final case class BindColl(v: V) extends Binding         // [?x ...]
  final case class BindTuple(vs: List[V]) extends Binding // [?x ?y]
  final case class BindRel(vs: List[V]) extends Binding   // [[?x ?y]]

  sealed trait Clause
  final case class Triple(e: Term, a: String, v: Term) extends Clause
  final case class Pred(fn: String, args: List[Term], binding: Option[Binding]) extends Clause
  final case class GetAttr(e: Term, a: String, default: Option[Edn.Val], binding: Binding) extends Clause
  final case class Not(joinVars: Option[List[V]], clauses: List[Clause]) extends Clause
  final case class Or(joinVars: Option[List[V]], branches: List[List[Clause]]) extends Clause
  final case class RuleCall(name: String, args: List[Term]) extends Clause

  sealed trait FindElem
  final case class FindVar(v: V) extends FindElem
  final case class FindAgg(fn: String, n: Option[Long], v: V) extends FindElem
  /** `(pull ?e [pattern…])` in :find (query.clj:118-125, crux pull). */
  final case class FindPull(v: V, pattern: Edn.Val) extends FindElem

  final case class RuleDef(name: String, args: List[V], clauses: List[Clause])

  final case class InBind(binding: Binding)

  final case class Query(
      find: List[FindElem],
      keys: Option[List[String]],
      where: List[Clause],
      in: List[InBind],
      rules: List[RuleDef],
      orderBy: List[(FindElem, Boolean)], // (elem, ascending)
      limit: Option[Long],
      offset: Option[Long],
      /** Legacy `:args [{:x 1} …]` relation (query.clj:150-155 normalizes
        * arg maps into an extra `:in` relation over the first map's keys;
        * ported queries use both). None when absent or empty. */
      argsRel: Option[(List[V], List[List[Edn.Val]])] = None,
      /** `:timeout` ms — honored by eager executors ([[graft.http.GraftNode.q]]),
        * query.clj's `:timeout`/with-timeout (query_test.clj:3384). */
      timeoutMs: Option[Long] = None)

  def parse(edn: String): Query = fromEdn(Edn.parse(edn))

  def fromEdn(v: Edn.Val): Query = {
    val entries: List[(Edn.Val, Edn.Val)] = v match {
      case MapV(es) => es
      // vector form [:find ... :where ...]; sections may be written either
      // bracketed (map style, ":where [[e :a v] ...]") or flat
      // (":where [e :a v] [e :b w]") — disambiguated per section below
      case Vec(items) =>
        val buf = scala.collection.mutable.ListBuffer[(Edn.Val, Edn.Val)]()
        var cur: Option[(Kw, scala.collection.mutable.ListBuffer[Edn.Val])] = None
        items.foreach {
          case k: Kw =>
            cur.foreach { case (kw, vs) => buf += kw -> Vec(vs.toList) }
            cur = Some((k, scala.collection.mutable.ListBuffer[Edn.Val]()))
          case item => cur.get._2 += item
        }
        cur.foreach { case (kw, vs) => buf += kw -> Vec(vs.toList) }
        buf.toList.map {
          case (k @ Kw(kn), Vec(List(single)))
              if kn == "limit" || kn == "offset" || kn == "timeout" =>
            (k, single)
          case (k @ Kw(kn), Vec(List(v2: Vec))) if kn == "find" || kn == "in" ||
              kn == "rules" || kn == "keys" || kn == "strs" || kn == "syms" =>
            (k, v2) // bracketed section
          case (k @ Kw("where"), Vec(List(v2 @ Vec(inner))))
              if inner.forall { case _: Vec | _: Lst => true; case _ => false } =>
            (k, v2) // bracketed clause list (a flat clause has sym/kw items)
          case (k @ Kw("order-by"), Vec(List(v2 @ Vec(inner))))
              if inner.nonEmpty && inner.forall { case _: Vec => true; case _ => false } =>
            (k, v2)
          case kv => kv
        }
      case other => throw new IllegalArgumentException(s"bad query form: $other")
    }
    val m = entries.map { case (k: Kw, value) => k.name -> value
                          case (k, _) => throw new IllegalArgumentException(s"non-keyword query key $k") }.toMap

    val find = m.getOrElse("find", throw new IllegalArgumentException("missing :find")) match {
      case Vec(items) => items.map(parseFindElem)
      case other => throw new IllegalArgumentException(s"bad :find $other")
    }
    val keys = m.get("keys").orElse(m.get("strs")).orElse(m.get("syms")).map {
      case Vec(items) => items.map { case Sym(n) => n; case Str(n2) => n2; case Kw(n3) => n3
                                     case o => throw new IllegalArgumentException(s"bad key $o") }
      case o => throw new IllegalArgumentException(s"bad :keys $o")
    }
    val where = m.get("where").map { case Vec(items) => items.map(parseClause); case o => throw new IllegalArgumentException(s"bad :where $o") }.getOrElse(Nil)
    val in = m.get("in").map { case Vec(items) => items.filter { case Sym("$") => false; case _ => true }.map(i => InBind(parseBinding(i))); case o => throw new IllegalArgumentException(s"bad :in $o") }.getOrElse(Nil)
    val rules = m.get("rules").map { case Vec(items) => items.map(parseRuleDef); case o => throw new IllegalArgumentException(s"bad :rules $o") }.getOrElse(Nil)
    val orderBy = m.get("order-by").map {
      case Vec(items) => items.map {
        case Vec(List(fe, Kw(dir))) => (parseFindElem(fe), dir == "asc")
        case Vec(List(fe)) => (parseFindElem(fe), true)
        case o => throw new IllegalArgumentException(s"bad :order-by elem $o")
      }
      case o => throw new IllegalArgumentException(s"bad :order-by $o")
    }.getOrElse(Nil)
    val limit = m.get("limit").map { case Lng(n) => n; case o => throw new IllegalArgumentException(s"bad :limit $o") }
    val offset = m.get("offset").map { case Lng(n) => n; case o => throw new IllegalArgumentException(s"bad :offset $o") }
    val argsRel = m.get("args").map {
      // single-map form `:args {ids #{…}}` (bitemporal_tale_test.clj:204)
      // = a one-row relation
      case mv: MapV => Vec(List(mv))
      case other => other
    }.flatMap {
      case Vec(Nil) => None // `:args []` constrains nothing
      case Vec(maps) =>
        val entries = maps.map {
          case MapV(es) => es.map {
            case (Kw(n), av) => varName(n) -> av
            case (Sym(n), av) => varName(n) -> av
            case (k, _) => throw new IllegalArgumentException(s"bad :args key $k")
          }.toMap
          case o => throw new IllegalArgumentException(s"bad :args element $o")
        }
        // the first map's keys define the bound vars (query.clj:150-155)
        val vars = maps.head match {
          case MapV(es) => es.map {
            case (Kw(n), _) => V(varName(n))
            case (Sym(n), _) => V(varName(n))
            case (k, _) => throw new IllegalArgumentException(s"bad :args key $k")
          }
          case o => throw new IllegalArgumentException(s"bad :args element $o")
        }
        val rows = entries.map(e => vars.map(v => e.getOrElse(v.name,
          throw new IllegalArgumentException(s"arg map missing key ${v.name}"))))
        if (vars.isEmpty) None // `:args [{}]` binds nothing (issue 314)
        else Some((vars, rows))
      case o => throw new IllegalArgumentException(s"bad :args $o")
    }
    val timeoutMs = m.get("timeout").map {
      case Lng(n) => n; case o => throw new IllegalArgumentException(s"bad :timeout $o") }
    Query(find, keys, where, in, rules, orderBy, limit, offset, argsRel, timeoutMs)
  }

  def varName(s: String): String = if (s.startsWith("?")) s.drop(1) else s

  private val gaCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  private def parseTerm(v: Edn.Val): Term = v match {
    case Sym("_") => Blank
    case Sym(n) => V(varName(n))
    case other => C(other)
  }

  /** Higher-order registry fns whose FIRST arg is a fn value
    * (`(map inc ?xs)`, `(max-key count ?a ?b)`). Only there is a bare
    * symbol kept as a constant for the planner's registry dispatch —
    * everywhere else (triples, rule bodies, other pred args) bare symbols
    * stay vars (datascript/racket-datalog var naming). */
  private val hofFns = Set(
    "map", "mapv", "keep", "filter", "filterv", "remove", "every?", "some",
    "not-any?", "not-every?", "take-while", "drop-while", "max-key",
    "min-key", "apply", "sort-by")

  private def parsePredArg(fn: String, i: Int)(v: Edn.Val): Term = v match {
    case s @ Sym(n) if i == 0 && hofFns(fn) && !n.startsWith("?") => C(s)
    // class symbol in leading position: (instance? String x), (cast Long x)
    case s @ Sym(n) if i == 0 && !n.startsWith("?") &&
        (fn.split('/').last == "instance?" || fn.split('/').last == "cast") => C(s)
    // fn-symbol in non-leading position: (subseq coll test key),
    // (update m k f)
    case s @ Sym(n) if !n.startsWith("?") &&
        (((fn == "subseq" || fn == "rsubseq") && i == 1) ||
          ((fn == "update" || fn == "update-in") && i == 2)) => C(s)
    case other => parseTerm(other)
  }

  private def parseFindElem(v: Edn.Val): FindElem = v match {
    case Sym(n) => FindVar(V(varName(n)))
    case Lst(List(Sym("pull"), Sym(e), pat: Vec)) => FindPull(V(varName(e)), pat)
    case Lst(List(Sym(fn), Sym(arg))) => FindAgg(fn, None, V(varName(arg)))
    case Lst(List(Sym(fn), Lng(n), Sym(arg))) => FindAgg(fn, Some(n), V(varName(arg)))
    case other => throw new IllegalArgumentException(s"unsupported find element $other")
  }

  private def parseBinding(v: Edn.Val): Binding = v match {
    case Sym(n) => BindScalar(V(varName(n)))
    case Vec(List(Sym(n), Sym("..."))) => BindColl(V(varName(n)))
    case Vec(List(Vec(items))) => BindRel(items.map { case Sym(n) => V(varName(n)); case o => throw new IllegalArgumentException(s"bad rel binding $o") })
    case Vec(items) => BindTuple(items.map { case Sym(n) => V(varName(n)); case o => throw new IllegalArgumentException(s"bad tuple binding $o") })
    case other => throw new IllegalArgumentException(s"bad binding $other")
  }

  def parseClause(v: Edn.Val): Clause = v match {
    // [e :attr v] triple (2- and 3-element forms; blank v when omitted)
    case Vec(List(e, Kw(a))) => Triple(parseTerm(e), a, Blank)
    case Vec(List(e, Kw(a), value)) => Triple(parseTerm(e), a, parseTerm(value))
    // [(pred args...)] and [(f args...) bind...]
    case Vec((l: Lst) :: rest) =>
      l.items match {
        case Sym("get-attr") :: e :: Kw(a) :: defaultRest =>
          val binding = rest match {
            case List(b) => parseBinding(b)
            // binding-less `[(get-attr e :a)]` is an existence predicate
            // (query_test.clj:1100) — bind a throwaway var; set semantics
            // at :find projection discard it. Dots in the attr would
            // parse as struct-field access in col() downstream — sanitize
            // like Planner.gensym does.
            case Nil => BindColl(V(
              s"__ga_exists_${a.replace('.', '_')}_${gaCounter.incrementAndGet()}"))
            case _ => throw new IllegalArgumentException("get-attr needs a binding")
          }
          GetAttr(parseTerm(e), a, defaultRest.headOption, binding)
        case Sym(fn) :: args =>
          val binding = rest match {
            case Nil => None
            case List(b) => Some(parseBinding(b))
            case o => throw new IllegalArgumentException(s"bad pred binding $o")
          }
          Pred(fn, args.zipWithIndex.map { case (a, i) => parsePredArg(fn, i)(a) }, binding)
        case o => throw new IllegalArgumentException(s"bad pred clause $o")
      }
    case Lst(Sym("not") :: clauses) => Not(None, clauses.map(parseClause))
    case Lst(Sym("not-join") :: Vec(vars) :: clauses) =>
      Not(Some(vars.map { case Sym(n) => V(varName(n)); case o => throw new IllegalArgumentException(s"bad not-join var $o") }), clauses.map(parseClause))
    case Lst(Sym("or") :: branches) => Or(None, branches.map(parseBranch))
    case Lst(Sym("or-join") :: Vec(vars) :: branches) =>
      // `[[?bound] ?free]` destructuring: boundness is an execution hint in
      // the reference (query.clj:1087-1144); relationally both are join vars
      Or(Some(vars.flatMap {
        case Sym(n) => List(V(varName(n)))
        case Vec(bound) => bound.map { case Sym(n) => V(varName(n)); case o => throw new IllegalArgumentException(s"bad or-join var $o") }
        case o => throw new IllegalArgumentException(s"bad or-join var $o")
      }), branches.map(parseBranch))
    case Lst(Sym(rule) :: args) => RuleCall(rule, args.map(parseTerm))
    case other => throw new IllegalArgumentException(s"unsupported clause $other")
  }

  private def parseBranch(v: Edn.Val): List[Clause] = v match {
    case Lst(Sym("and") :: clauses) => clauses.map(parseClause)
    case other => List(parseClause(other))
  }

  private def parseRuleDef(v: Edn.Val): RuleDef = v match {
    case Vec(Lst(Sym(name) :: args) :: clauses) =>
      val argVars = args.flatMap {
        case Sym(n) => List(V(varName(n)))
        case Vec(bound) => bound.map { case Sym(n) => V(varName(n)); case o => throw new IllegalArgumentException(s"bad rule arg $o") }
        case o => throw new IllegalArgumentException(s"bad rule arg $o")
      }
      RuleDef(name, argVars, clauses.map(parseClause))
    case other => throw new IllegalArgumentException(s"bad rule def $other")
  }
}

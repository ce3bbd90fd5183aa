package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.{Planner, QuadSource}

/** Generative cross-check of the Datalog planner against an independent
  * in-memory evaluator of conjunctive-query semantics (set-semantic
  * results, implicit equi-joins on shared vars, range predicates, not —
  * the core of crux-core/src/crux/query.clj). Random queries over a tiny
  * quad fixture; any divergence prints the query for replay.
  */
class DatalogModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val facts: Seq[(String, String, Any)] = Seq(
    ("a", "name", "Ann"), ("a", "age", 20L), ("a", "follows", "b"),
    ("b", "name", "Bob"), ("b", "age", 30L), ("b", "follows", "c"),
    ("c", "name", "Cec"), ("c", "age", 30L), ("c", "follows", "a"),
    ("d", "name", "Dan"), ("d", "age", 40L),
    ("d", "follows", "a"), ("d", "follows", "b"))

  private lazy val source: QuadSource = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val rows = facts.map {
      case (e, a, v: String) => Row(e, a, v, null)
      case (e, a, v: Long) => Row(e, a, null, v)
      case x => throw new IllegalStateException(x.toString)
    }
    val schema = StructType(Seq(
      StructField("e", StringType), StructField("a", StringType),
      StructField("v_str", StringType), StructField("v_num", LongType)))
    new QuadSource(spark.createDataFrame(rows.asJava, schema),
      Map("name" -> "v_str", "age" -> "v_num", "follows" -> "v_str"))
  }

  // ------------------------------------------------------------- the model
  private type Binding = Map[String, Any]

  private def evalTriple(bs: Set[Binding], eVar: String, attr: String, vVar: String): Set[Binding] =
    bs.flatMap { b =>
      facts.collect { case (e, a, v) if a == attr => (e, v) }.flatMap { case (e, v) =>
        val b1 = if (b.contains(eVar)) { if (b(eVar) == e) Some(b) else None }
                 else Some(b + (eVar -> e))
        b1.flatMap { bb =>
          if (bb.contains(vVar)) { if (bb(vVar) == v) Some(bb) else None }
          else Some(bb + (vVar -> v))
        }
      }
    }

  /** Range with crux type-tag semantics: numbers(5) < strings(8), so a
    * string value compared to a long literal resolves by tag order. */
  private def evalRange(bs: Set[Binding], v: String, op: String, lit: Long): Set[Binding] =
    bs.filter { b =>
      b(v) match {
        case l: Long => op match {
          case "<" => l < lit; case "<=" => l <= lit
          case ">" => l > lit; case ">=" => l >= lit; case "=" => l == lit
        }
        case _: String => op match { // tag 8 vs 5
          case ">" | ">=" => true
          case _ => false
        }
        case _ => false
      }
    }

  // -------------------------------------------------------------- the test
  private case class TripleC(e: String, a: String, v: String)

  private def runScenario(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val attrs = Vector("name", "age", "follows")
    val varPool = Vector("x", "y", "z", "w")
    val n = 2 + rnd.nextInt(3)
    val triples = (0 until n).map { _ =>
      TripleC("e" + rnd.nextInt(2), attrs(rnd.nextInt(attrs.size)), varPool(rnd.nextInt(varPool.size)))
    }
    // ensure connectivity to entity var e0 is not required — planner cross
    // joins disconnected groups, model joins naturally
    val ageVars = triples.filter(_.a == "age").map(_.v).distinct
    val rangePred = ageVars.headOption.filter(_ => rnd.nextBoolean()).map { v =>
      val ops = Vector("<", "<=", ">", ">=")
      (v, ops(rnd.nextInt(ops.size)), 20L + 10L * rnd.nextInt(3))
    }

    // optional not-clause over vars the positive triples bind
    val boundVars = triples.flatMap(t => Seq(t.e, t.v)).distinct
    val notClause = if (rnd.nextBoolean()) Some(TripleC(
      boundVars(rnd.nextInt(boundVars.size)), attrs(rnd.nextInt(attrs.size)),
      boundVars(rnd.nextInt(boundVars.size)))) else None

    // model evaluation
    var bs: Set[Binding] = Set(Map.empty)
    triples.foreach(t => bs = evalTriple(bs, t.e, t.a, t.v))
    rangePred.foreach { case (v, op, l) => bs = evalRange(bs, v, op, l) }
    notClause.foreach(t => bs = bs.filter(b => evalTriple(Set(b), t.e, t.a, t.v).isEmpty))

    val findVars = (triples.flatMap(t => Seq(t.e, t.v)) ++ rangePred.map(_._1)).distinct
    val expected = bs.map(b => findVars.map(b))

    // planner evaluation
    val where = (triples.map(t => s"[?${t.e} :${t.a} ?${t.v}]") ++
      rangePred.map { case (v, op, l) => s"[($op ?$v $l)]" } ++
      notClause.map(t => s"(not [?${t.e} :${t.a} ?${t.v}])")).mkString(" ")
    val q = s"[:find ${findVars.map("?" + _).mkString(" ")} :where [$where]]"
    val actual = Planner.q(spark, source, q).collect().toSet[Row].map(_.toSeq)
    assert(actual == expected, s"seed=$seed query=$q\nexpected=$expected\nactual=$actual")
  }

  (1 to 10).foreach { seed =>
    test(s"random conjunctive query matches the relational model (seed $seed)") {
      runScenario(seed)
    }
  }
}

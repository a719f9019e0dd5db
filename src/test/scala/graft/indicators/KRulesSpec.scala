package graft.indicators

import graft.TestSession
import org.apache.spark.sql.functions.expr
import org.scalatest.funsuite.AnyFunSuite

/** Positive-fixture gates for the 4-5-bar trend-confirmation rules added
  * in round 3: the sf0.01 corpus never produces their exact shapes (the
  * oracle only proves both engines agree on `false`), so each rule gets a
  * hand-crafted textbook bar sequence here proving it CAN fire — and a
  * perturbed negative proving the guard that breaks it.
  */
class KRulesSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private val base: Map[String, Double] = Map(
    "open" -> 0, "high" -> 0, "low" -> 0, "close" -> 0,
    "po" -> 0, "ph" -> 0, "pl" -> 0, "pc" -> 0,
    "o2" -> 0, "h2" -> 0, "l2" -> 0, "c2" -> 0,
    "o3" -> 0, "c3" -> 0, "h3" -> 0, "l3" -> 0,
    "o4" -> 0, "c4" -> 0, "h4" -> 0, "l4" -> 0,
    "ab" -> 1.0)

  private def rule(name: String): String =
    KRules.RULES.find(_._1 == name).map(_._2)
      .getOrElse(fail(s"no rule $name"))

  private def fires(name: String, vals: (String, Double)*): Boolean = {
    val s = spark
    import s.implicits._
    val m = base ++ vals.toMap
    val cols = m.keys.toSeq
    Seq(cols.map(m)).map(v => (v(0), v)).toDF("_x", "vs")
      .selectExpr(cols.zipWithIndex.map { case (c, i) => s"vs[$i] AS $c" }: _*)
      // same two hoisted-vocabulary stages the battery applies
      // (Patterns.scala) — rules reference these columns, not the macros
      .withColumns(KRules.VOCAB1.map { case (n, e) => n -> expr(e) }.toMap)
      .withColumns(KRules.VOCAB2.map { case (n, e) => n -> expr(e) }.toMap)
      .select(expr(rule(name)).as("f"))
      .head.getBoolean(0)
  }

  test("rising_three_methods fires on the textbook shape, not without containment") {
    val shape = Seq("o4" -> 10.0, "c4" -> 20.0, "h4" -> 21.0, "l4" -> 9.0,
      "o3" -> 19.0, "c3" -> 17.0, "o2" -> 18.0, "c2" -> 16.0,
      "po" -> 17.0, "pc" -> 15.0, "open" -> 16.0, "close" -> 23.0)
    assert(fires("rising_three_methods", shape: _*))
    // middle bar escapes bar-4's range => no pattern
    assert(!fires("rising_three_methods", (shape.toMap + ("c2" -> 8.0)).toSeq: _*))
  }

  test("falling_three_methods fires on the mirror shape") {
    assert(fires("falling_three_methods",
      "o4" -> 20.0, "c4" -> 10.0, "h4" -> 21.0, "l4" -> 9.0,
      "o3" -> 11.0, "c3" -> 13.0, "o2" -> 12.0, "c2" -> 14.0,
      "po" -> 13.0, "pc" -> 15.0, "open" -> 14.0, "close" -> 7.0))
  }

  test("mat_hold holds above the first bar's midpoint") {
    val shape = Seq("o4" -> 10.0, "c4" -> 20.0,
      "o3" -> 22.0, "c3" -> 21.0, "h3" -> 22.5,
      "o2" -> 21.5, "c2" -> 20.5, "h2" -> 21.8,
      "po" -> 21.0, "pc" -> 20.0, "ph" -> 21.2,
      "open" -> 20.0, "close" -> 23.0)
    assert(fires("mat_hold", shape: _*))
    // a middle close sagging below the midpoint kills it
    assert(!fires("mat_hold", (shape.toMap + ("pc" -> 14.0)).toSeq: _*))
  }

  test("ladder_bottom needs the 4th bar's upper shadow and the gap-up white") {
    val shape = Seq("o4" -> 20.0, "c4" -> 16.0, "o3" -> 19.0, "c3" -> 15.0,
      "o2" -> 18.0, "c2" -> 14.0, "po" -> 17.0, "pc" -> 13.0, "ph" -> 18.5,
      "open" -> 17.5, "close" -> 19.0)
    assert(fires("ladder_bottom", shape: _*))
    assert(!fires("ladder_bottom", (shape.toMap + ("ph" -> 17.5)).toSeq: _*))
  }

  test("bull_breakaway closes back inside the gap") {
    val shape = Seq("o4" -> 20.0, "c4" -> 10.0, "o3" -> 9.0, "c3" -> 8.0,
      "c2" -> 7.0, "pc" -> 6.0, "open" -> 6.0, "close" -> 9.5)
    assert(fires("bull_breakaway", shape: _*))
    // closing above the gap is no longer a breakaway
    assert(!fires("bull_breakaway", (shape.toMap + ("close" -> 11.0)).toSeq: _*))
  }

  test("concealing_baby_swallow engulfs the third bar") {
    assert(fires("concealing_baby_swallow",
      "o4" -> 20.0, "c4" -> 10.0, "h4" -> 20.0, "l4" -> 10.0,
      "o3" -> 10.0, "c3" -> 5.0, "h3" -> 10.0, "l3" -> 5.0,
      "po" -> 4.0, "pc" -> 3.0, "ph" -> 5.5, "pl" -> 2.8,
      "open" -> 4.0, "close" -> 3.0, "high" -> 6.0, "low" -> 2.0))
  }

  test("three_stars_in_south contracts into the prior bar") {
    assert(fires("three_stars_in_south",
      "o2" -> 20.0, "c2" -> 15.0, "l2" -> 10.0,
      "po" -> 18.0, "pc" -> 16.0, "pl" -> 11.0, "ph" -> 18.5,
      "open" -> 16.0, "close" -> 15.2, "low" -> 11.5, "high" -> 17.0))
  }

  test("hikkake: inside bar then false breakout, both directions") {
    assert(fires("bull_hikkake",
      "h2" -> 20.0, "l2" -> 10.0, "ph" -> 18.0, "pl" -> 12.0,
      "low" -> 11.0, "close" -> 13.0))
    assert(fires("bear_hikkake",
      "h2" -> 20.0, "l2" -> 10.0, "ph" -> 18.0, "pl" -> 12.0,
      "high" -> 19.0, "close" -> 17.0))
  }
}

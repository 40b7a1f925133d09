package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LanguageIdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pred(texts: (Long, String)*) =
    LanguageId.classify(texts.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("lang_pred"))) null
         else r.getString(r.fieldIndex("lang_pred")))).toMap

  test("each planted language classifies correctly (per-language precision 1.0)") {
    val fixtures = Seq(
      1L -> ("de", "Der Mann und die Frau sind nicht hier aber der Schnee ist weich"),
      2L -> ("en", "The cat is sleeping and the dog is running to the park"),
      3L -> ("es", "El perro corre por el parque con los gatos y una paloma"),
      4L -> ("fr", "Le chien court dans le parc et les chats sont une famille"),
      5L -> ("it", "Il cane che corre di notte per la citta con attenzione e passione"),
      6L -> ("pt", "Uma gata corre para os campos com as outras aves das ilhas"))
    val got = pred(fixtures.map { case (id, (_, t)) => id -> t }: _*)
    fixtures.foreach { case (id, (lang, t)) =>
      assert(got(id) === lang, s"doc $id ($t) -> ${got(id)}, want $lang")
    }
  }

  test("majority language survives cross-language contamination") {
    val got = pred(
      1L -> ("Der schnelle Fuchs springt und die Katze ist nicht langsam " +
        "der Hund und die Maus sind hier the cat and the dog"),
      2L -> ("le renard saute dans la foret et les chiens sont une meute " +
        "qui est grande the end of it"))
    assert(got(1L) === "de")
    assert(got(2L) === "fr")
  }

  test("no evidence -> null prediction, zero margin semantics") {
    val out = LanguageId.classify(
        Seq((1L, ""), (2L, "xyzzy qwerty 12345")).toDF("id", "text"),
        "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.isNullAt(r.fieldIndex("lang_pred")),
          r.getLong(r.fieldIndex("score_points"))))).toMap
    assert(out(1L) === ((true, 0L)))
    assert(out(2L) === ((true, 0L)))
  }

  test("ties break to the lexicographically smallest language code") {
    // ' est ' (fr, 75) vs nothing else... construct an exact tie:
    // ' con ' scores es 45 and nothing else; ' la ' scores it 40;
    // ' es ' scores es 40. Use grams weighted equally across langs:
    // ' the '(en 95) vs ' der '(de 95): one of each -> en==de tie,
    // winner must be 'de' (smaller code)
    val got = pred(1L -> "der the")
    assert(got(1L) === "de")
  }

  test("margin is winner minus runner-up in integer points") {
    // ' the ' x1 (en 95) + ' el ' x1 (es 90) -> margin 5
    val r = LanguageId.classify(
        Seq((1L, "the el")).toDF("id", "text"), "id", "text")
      .collect()(0)
    assert(r.getString(r.fieldIndex("lang_pred")) === "en")
    assert(r.getLong(r.fieldIndex("score_points")) === 95L)
    assert(r.getLong(r.fieldIndex("margin_points")) === 5L)
  }
}

"""operators/langid — char-n-gram profile language identification.

Pins the VERDICT r5 #5 'done' criteria: deterministic training +
prediction, and an accuracy floor on a held-out labeled corpus that
the old stopword-marker heuristic (text.lang_id) must not beat.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flycatcher_spark.operators import langid, text

# Small real-prose corpus, 8 INDEPENDENT sentences per language
# (not parallel translations — translated pairs share content words
# and make romance languages artificially adjacent). The held-out
# half is disjoint prose; the model must generalize from character
# patterns alone.
_CORPUS = {
    "en": [
        "the quick brown fox jumps over the lazy dog",
        "she walked through the garden while the kettle boiled",
        "a journey of a thousand miles begins with a single step",
        "children were playing football in the park yesterday",
        "reading books opens the mind to new worlds and ideas",
        "the weather this morning was cold and rather windy",
        "knowledge is power and learning never stops growing",
        "he bought fresh bread and cheese from the market",
    ],
    "de": [
        "der schnelle braune fuchs springt über den faulen hund",
        "sie ging durch den garten während das wasser kochte",
        "ich möchte heute abend mit meinen freunden essen gehen",
        "die kinder haben gestern im park fußball gespielt",
        "bücher lesen öffnet den geist für neue welten und ideen",
        "das wetter war heute morgen kalt und ziemlich windig",
        "wissen ist macht und lernen hört niemals auf zu wachsen",
        "er hat frisches brot und käse auf dem markt gekauft",
    ],
    "fr": [
        "le renard brun rapide saute par dessus le chien paresseux",
        "elle se promenait dans le jardin pendant que l'eau chauffait",
        "je voudrais aller manger avec mes amis ce soir",
        "les enfants jouaient au football dans le parc hier",
        "lire des livres ouvre l'esprit à de nouveaux mondes",
        "le temps était froid et plutôt venteux ce matin",
        "le savoir est le pouvoir et apprendre ne cesse jamais",
        "il a acheté du pain frais et du fromage au marché",
    ],
    "es": [
        "el rápido zorro marrón salta sobre el perro perezoso",
        "ella caminaba por el jardín mientras hervía el agua",
        "quiero salir a cenar con mis amigos esta noche",
        "los niños jugaban al fútbol en el parque ayer",
        "leer libros abre la mente a nuevos mundos e ideas",
        "el tiempo estaba frío y bastante ventoso esta mañana",
        "el conocimiento es poder y aprender nunca deja de crecer",
        "compró pan fresco y queso en el mercado esta tarde",
    ],
}


def _frames(spark):
    rows = []
    i = 0
    for lang, sents in _CORPUS.items():
        for s in sents:
            rows.append((i, lang, s))
            i += 1
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    train = df.where(F.col("doc_id") % 2 == 0)  # 4 sentences/lang
    test = df.where(F.col("doc_id") % 2 == 1)
    return train, test


class TestCharNgrams:
    def test_padded_grams(self, spark):
        df = spark.createDataFrame([("The  Cat",), ("",), ("ab",)], ["t"])
        got = [r["g"] for r in df.select(
            langid.char_ngrams("t").alias("g")).collect()]
        assert got[0][:3] == [" th", "the", "he "]
        assert got[0][-1] == "at "
        assert got[1] == []            # empty text -> no grams
        assert got[2] == [" ab", "ab "]


class TestLangidAccuracy:
    def test_beats_heuristic_with_floor(self, spark):
        """Held-out accuracy must be >= 0.9 AND >= the stopword
        heuristic's accuracy on the same split."""
        train, test = _frames(spark)
        prof = langid.train_langid_profiles(train, top_k=300)
        pred = langid.langid_predict(test, prof)
        rows = test.select("doc_id", "lang").join(
            pred, "doc_id"
        ).collect()
        n = len(rows)
        model_acc = sum(r["lang"] == r["lang_pred"] for r in rows) / n
        heur = {
            r["doc_id"]: r["h"]
            for r in test.select(
                "doc_id", text.lang_id("text").alias("h")
            ).collect()
        }
        heur_acc = sum(
            heur[r["doc_id"]] == r["lang"] for r in rows
        ) / n
        assert n == 16
        assert model_acc >= 0.9, f"model accuracy {model_acc}"
        assert model_acc >= heur_acc, (model_acc, heur_acc)

    def test_deterministic_profiles(self, spark):
        train, _ = _frames(spark)
        a = sorted(
            (r["lang"], r["gram"], str(r["cost9"]))
            for r in langid.train_langid_profiles(train, top_k=50).collect()
        )
        b = sorted(
            (r["lang"], r["gram"], str(r["cost9"]))
            for r in langid.train_langid_profiles(train, top_k=50).collect()
        )
        assert a == b and len(a) == 200  # 4 langs x top_k 50

    def test_gramless_doc_is_und(self, spark):
        train, _ = _frames(spark)
        prof = langid.train_langid_profiles(train, top_k=50)
        df = spark.createDataFrame([(1, ""), (2, "x")], ["doc_id", "text"])
        got = {
            r["doc_id"]: (r["lang_pred"], r["n_grams"], r["total_cost"])
            for r in langid.langid_predict(df, prof).collect()
        }
        assert got[1] == ("und", 0, None)
        # "x" pads to " x " -> one gram; predicted *something*, scored
        assert got[2][1] == 1 and got[2][0] != "und"

    def test_profile_is_broadcast_and_bounded(self, spark):
        """Scale shape: the gram-scoring join must broadcast the
        profile side (bounded langs x top_k table), and the only
        nested-loop join is the DELIBERATE broadcast of the tiny
        language list for the docs x langs score matrix (registered
        in tools/plan_audit.KNOWN_BNLJ)."""
        train, test = _frames(spark)
        prof = langid.train_langid_profiles(train, top_k=50)
        plan = langid.langid_predict(
            test, prof
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert plan.count("BroadcastNestedLoopJoin") == 1

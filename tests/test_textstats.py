"""Language-ID accuracy gate + text-stat edge cases.

The synthetic sf corpora carry a ``lang`` label column but their TEXT is
language-agnostic filler, so the accuracy oracle here is a constructed
labeled fixture: documents written with each language's actual stopwords
must classify correctly — this is the gate that catches a stopword-table
typo (every other rows-only query already has a pytest oracle; VERDICT
round 2, "What's missing" #1).
"""

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(texts):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    }))


# Each doc mixes its language's stopwords with neutral filler tokens —
# filler is deliberately non-stopword in every table.
_LABELED = [
    ("en", "the cat sat and looked at the dog for a while in it"),
    ("en", "it is that time of the year for a walk to town"),
    ("de", "der hund und die katze sind ein gutes team zu hause"),
    ("de", "das ist nicht der richtige weg zu den bergen"),
    ("fr", "le chien et la souris dans les champs pour que rien"),
    ("fr", "est une belle journee pour le marche dans la ville"),
    ("es", "el perro y la gata en los campos de que hablar"),
    ("es", "es un dia y una noche en el campo los dos"),
]


class TestLangIdAccuracy:
    def test_labeled_fixture_accuracy(self, ray_session):
        from raydedup.stages.textstats import lang_id
        texts = [t for _, t in _LABELED]
        out = lang_id(_docs_ds(texts)).to_pandas().sort_values("doc_id")
        got = out["lang_pred"].tolist()
        want = [l for l, _ in _LABELED]
        acc = np.mean([g == w for g, w in zip(got, want)])
        assert acc == 1.0, f"lang_id mispredicts labeled fixture: {list(zip(want, got))}"

    def test_no_stopwords_is_und(self, ray_session):
        from raydedup.stages.textstats import lang_id
        out = lang_id(_docs_ds(["zzz qqq xxx www", ""])).to_pandas()
        assert set(out["lang_pred"]) == {"und"}

    def test_tie_goes_alphabetically_first(self, ray_session):
        from raydedup.stages.textstats import lang_id
        # one 'en' stopword + one 'fr' stopword → tie → 'en' (sorted first)
        out = lang_id(_docs_ds(["the le zebra"])).to_pandas()
        assert out["lang_pred"].tolist() == ["en"]

    def test_every_table_is_reachable(self, ray_session):
        # a doc of ONLY lang L's stopwords must predict L, for every L —
        # a broken/empty table for any language fails here
        from raydedup.stages.textstats import _STOPWORDS, lang_id
        langs = sorted(_STOPWORDS)
        texts = [" ".join(sorted(_STOPWORDS[l])) for l in langs]
        out = lang_id(_docs_ds(texts)).to_pandas().sort_values("doc_id")
        assert out["lang_pred"].tolist() == langs

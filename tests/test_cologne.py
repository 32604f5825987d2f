"""Cologne phonetics: published canonical vectors + blocking sanity."""

from __future__ import annotations

from graph_database_spark.operators.linkage import with_cologne

# Published Koelner Phonetik reference encodings (ASCII subset).
VECTORS = [
    ("breschnew", "17863"),
    ("wikipedia", "3412"),
    ("mueller", "657"),
    ("philipp", "351"),   # ph->3, i->0, l->5, i->0, pp->1 (dedup)
    ("schmidt", "862"),   # s(ch)->8, c after s->8 dedup, h drop, m6 d2 t2 dedup
]


def test_cologne_canonical_vectors(spark):
    df = spark.createDataFrame([(w,) for w, _ in VECTORS], "w string")
    got = {r["w"]: r["cologne"] for r in with_cologne(df, "w").collect()}
    for w, want in VECTORS:
        assert got[w] == want, (w, got[w], want)


def test_cologne_blocks_similar_sounding_words(spark):
    # The blocking property the key exists for: spelling variants of
    # the same sound collapse to one block.
    pairs = [("meyer", "maier"), ("schmidt", "schmitt"), ("wald", "walt")]
    words = [(w,) for p in pairs for w in p]
    df = spark.createDataFrame(words, "w string")
    got = {r["w"]: r["cologne"] for r in with_cologne(df, "w").collect()}
    for a, b in pairs:
        assert got[a] == got[b], (a, b, got[a], got[b])

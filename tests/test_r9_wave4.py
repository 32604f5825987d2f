"""Property fixtures for the round-9 continuation wave: Viterbi decode
(python dynamic-program replay), CDC chunking (reconstruction + the
shift-resistance property that motivates content-defined over
fixed-width chunking), and Naive Bayes (python replay on a tiny
corpus)."""

from __future__ import annotations

import hashlib
import math
import re
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from graph_database_spark.operators.cdc import (
    MASK,
    POWERS,
    PRIME,
    WINDOW,
    cdc_chunks,
)
from graph_database_spark.operators.viterbi import (
    INIT,
    T_STAY,
    T_SWITCH,
    viterbi_decode,
)


def _py_viterbi(seqs):
    """Straightforward python Viterbi over micro-int emissions — the
    independent replay of the JVM fold."""
    out = {}
    for user, ems in seqs.items():
        (e0, e1) = ems[0]
        v0, v1, p0, p1 = INIT + e0, INIT + e1, "0", "1"
        for e0, e1 in ems[1:]:
            s00, s10 = v0 + T_STAY, v1 + T_SWITCH
            s01, s11 = v0 + T_SWITCH, v1 + T_STAY
            n0 = e0 + max(s00, s10)
            np0 = (p0 if s00 >= s10 else p1) + "0"
            n1 = e1 + max(s01, s11)
            np1 = (p0 if s01 >= s11 else p1) + "1"
            v0, v1, p0, p1 = n0, n1, np0, np1
        out[user] = (v0, p0) if v0 >= v1 else (v1, p1)
    return out


def test_viterbi_matches_python_replay(spark):
    base = datetime(2024, 1, 1)
    rows = []
    # user 1 alternates regimes; user 2 is all-common; user 3 has one event.
    pattern = {1: "aabbbaab", 2: "aaaa", 3: "b"}
    eid = 0
    for user, s in pattern.items():
        for i, ch in enumerate(s):
            rows.append((user, eid, base + timedelta(minutes=i), ch))
            eid += 1
    e = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    got = {
        r["user_id"]: (r["score_micro"], r["path"])
        for r in viterbi_decode(e).collect()
    }
    # Python emissions from the same global frequencies.
    n_a = sum(s.count("a") for s in pattern.values())
    tot = sum(len(s) for s in pattern.values())
    em = {
        "a": (
            round(1e6 * math.log(n_a / tot)),
            round(1e6 * math.log((tot - n_a) / tot)),
        ),
        "b": (
            round(1e6 * math.log((tot - n_a) / tot)),
            round(1e6 * math.log(n_a / tot)),
        ),
    }
    seqs = {u: [em[c] for c in s] for u, s in pattern.items()}
    assert got == _py_viterbi(seqs)
    # Single-event user decodes to the higher-emission initial state.
    assert len(got[3][1]) == 1


def _py_chunks(text):
    norm = re.sub(" +", " ", re.sub("[^a-z0-9 ]", "", text.lower())).strip()
    n = len(norm)
    codes = [ord(c) for c in norm]
    bounds = []
    for i in range(WINDOW, n + 1):  # 1-based end positions
        h = sum(codes[i - 1 - k] * POWERS[k] for k in range(WINDOW)) % PRIME
        if h % MASK == 0:
            bounds.append(i)
    if not bounds or bounds[-1] != n:
        bounds.append(n)
    chunks, start = [], 1
    for j, b in enumerate(bounds):
        piece = norm[start - 1 : b]
        chunks.append(
            (j, start, b - start + 1, hashlib.md5(piece.encode()).hexdigest())
        )
        start = b + 1
    return norm, chunks


def test_cdc_chunks_match_python_and_reconstruct(spark):
    texts = [
        (1, "The quick brown fox jumps over the lazy dog " * 8),
        (2, "lorem ipsum dolor sit amet consectetur adipiscing elit " * 6),
        (3, "tiny"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for r in cdc_chunks(docs).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["start"], r["chunk_len"], r["chunk_md5"])
        )
    for doc_id, text in texts:
        norm, expect = _py_chunks(text)
        assert sorted(got[doc_id]) == expect, doc_id
        # Chunks tile the normalized text exactly.
        assert sum(c[2] for c in expect) == len(norm)


def test_cdc_shift_resistance(spark):
    # Prepending a sentence to a long doc must leave the chunk-hash
    # TAIL intact — the property fixed-width chunking lacks. All chunks
    # strictly after the first boundary beyond the edit point realign.
    body = "the quick brown fox jumps over the lazy dog " * 10
    docs = spark.createDataFrame(
        [(1, body), (2, "zzz inserted prefix here " + body)],
        "doc_id long, text string",
    )
    rows = cdc_chunks(docs).collect()
    h1 = [r["chunk_md5"] for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_idx"])) if r["doc_id"] == 1]
    h2 = [r["chunk_md5"] for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_idx"])) if r["doc_id"] == 2]
    # Everything after the first (edited) chunk realigns verbatim: the
    # hash SEQUENCES agree from chunk 1 onward despite the 25-char shift.
    k = len(h1) - 1
    assert k >= 3
    assert h1[-k:] == h2[-k:]

"""Plan-regression guard: pre-AQE Exchange counts vs committed PLANS.md.

The repo's reuse rule (CLAUDE.md: localCheckpoint any frame referenced
more than once downstream) has been violated twice with correct answers
and catastrophic plans — r3's 41-Exchange clustering-coefficient and
r5's 42-Exchange link_prediction (VERDICT r5 #1). Both times the defect
was visible in exactly the number scripts/dump_plans.py already records:
the pre-AQE Exchange count. This test turns that number into a gate: a
removed checkpoint re-derives an upstream pipeline per consumer and the
count jumps by the pipeline's width (tens), far beyond TOLERANCE.

Regenerate the baseline with `python scripts/dump_plans.py` after an
INTENTIONAL plan change; the test fails loudly on unintentional ones.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

# A genuine plan improvement that removes shuffles should be committed
# via dump_plans.py; small jitter (AQE conf, Spark minor version) gets
# this much slack before we call it a regression.
TOLERANCE = 2


def _baseline() -> dict[str, int]:
    text = (REPO / "PLANS.md").read_text()
    pairs = re.findall(
        r"^## (\w+)\n\n- shuffles \(Exchange nodes, pre-AQE\): (\d+)$",
        text,
        re.M,
    )
    assert pairs, "PLANS.md missing or format drifted — regenerate it"
    return {name: int(n) for name, n in pairs}


def test_exchange_counts_vs_plans_md(spark):
    import sys

    sys.path.insert(0, str(REPO))
    from scripts.dump_plans import SHOW, count_exchanges, plan_text

    baseline = _baseline()
    missing = [n for n in SHOW if n not in baseline]
    assert not missing, f"PLANS.md lacks baselines for {missing} — regenerate"

    regressions = {}
    for name in SHOW:
        got = count_exchanges(plan_text(spark, name))
        if got > baseline[name] + TOLERANCE:
            regressions[name] = (baseline[name], got)
    assert not regressions, (
        "Exchange-count regressions (baseline, now) — a checkpoint was "
        f"probably dropped (CLAUDE.md reuse rule): {regressions}"
    )

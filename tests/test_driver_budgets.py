"""Pin the driver/state budgets of the greedy selection operators.

mmr_diverse_topk and kcenter_coreset both document a hard bound on the
frames they pull out of the distributed plan (localCheckpoint
materializations and driver-side collects): |Q| x shortlist and
|Q| x shortlist^2 for MMR, pool and pool^2 for k-center — bounded by
SELECTION CONSTANTS, never by corpus rows.  That claim is what makes
them safe at 100 TB, so it gets the same treatment as the streaming
state bounds (test_state_eviction.py): measure the actual row counts by
spying on DataFrame.collect / DataFrame.localCheckpoint, assert they
equal the documented formulas, and assert they DO NOT MOVE when the
corpus quadruples.
"""
from __future__ import annotations

try:  # PySpark 4: concrete methods live on the classic subclass
    import pyspark.sql.classic.dataframe as dfmod
except ImportError:  # pragma: no cover - PySpark 3 fallback
    import pyspark.sql.dataframe as dfmod

from gcp_serverless_mapreduce_spark.operators import similarity


def _emb(spark, n: int, dim: int = 8):
    rows = [(i, [float(((i * 7 + j * 3) % 9) - 4) + 0.5
                 for j in range(dim)])
            for i in range(n)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


class _Spy:
    """Record the row count of every collect() and every eager
    localCheckpoint() issued while building an operator's result."""

    def __init__(self, monkeypatch):
        self.collects: list[int] = []
        self.checkpoints: list[int] = []
        orig_collect = dfmod.DataFrame.collect
        orig_lc = dfmod.DataFrame.localCheckpoint
        spy = self

        def collect(df):
            rows = orig_collect(df)
            spy.collects.append(len(rows))
            return rows

        def local_checkpoint(df, eager=True):
            res = orig_lc(df, eager=eager)
            # the frame is already materialized (eager), so counting it
            # reads cached blocks, not the lineage
            spy.checkpoints.append(len(orig_collect(res)))
            return res

        monkeypatch.setattr(dfmod.DataFrame, "collect", collect)
        monkeypatch.setattr(dfmod.DataFrame, "localCheckpoint",
                            local_checkpoint)


def test_mmr_checkpoint_budget_is_corpus_independent(spark, monkeypatch):
    num_q, shortlist, k = 4, 6, 3
    budgets = {}
    for n in (60, 240):
        spy = _Spy(monkeypatch)
        out = similarity.mmr_diverse_topk(
            _emb(spark, n), k, num_q, shortlist, 0.7, 0.3)
        n_rows = out.count()
        assert n_rows == num_q * k
        # exactly two checkpointed frames: the shortlist and the
        # candidate-candidate pair frame, at their documented bounds
        assert sorted(spy.checkpoints) == sorted(
            [num_q * shortlist,
             num_q * shortlist * (shortlist - 1)]), spy.checkpoints
        # nothing else is collected driver-side while building the plan
        assert spy.collects == [], spy.collects
        budgets[n] = spy.checkpoints
        monkeypatch.undo()
    assert budgets[60] == budgets[240], budgets


def test_kcenter_driver_budget_is_corpus_independent(spark, monkeypatch):
    k, pool = 4, 10
    budgets = {}
    for n in (60, 240):
        spy = _Spy(monkeypatch)
        res = similarity.kcenter_coreset(_emb(spark, n), k, pool)
        # building the result already ran the driver-side greedy; the
        # spy has everything before we touch the (tiny) result frame
        collected = list(spy.collects)
        checkpointed = list(spy.checkpoints)
        assert res.count() == k
        # ONE pool-row collect (the TakeOrdered pool sample); the pool^2
        # sims are a driver-side numpy fold over that same frame, so no
        # pool^2 collect and no checkpoint remain (r15 batch 5)
        assert collected == [pool], collected
        assert checkpointed == [], checkpointed
        budgets[n] = (collected, checkpointed)
        monkeypatch.undo()
    assert budgets[60] == budgets[240], budgets

"""Property-based CDC merge semantics: apply_changes vs a naive model.

Hypothesis generates arbitrary change batches (any mix of I/U/D, any
number of ops per key, arbitrary seq order); the oracle is a dict replay
of "apply ops in seq order, last op wins". Catches ordering and
tie-break bugs example tests can't enumerate.

Spark-session cost bounds the example count; the strategies are shaped
to hit the interesting overlaps (small key space → frequent multi-op
keys and change-vs-target collisions).
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aws_big_data_blog_dmscdc_walkthrough_spark.operators import cdc

KEYS = st.integers(min_value=0, max_value=7)  # small space → collisions
OPS = st.sampled_from(["I", "U", "D"])


@st.composite
def batches(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    rows = []
    for i in range(n):
        rows.append((draw(KEYS), draw(OPS), i, draw(st.integers(0, 100))))
    # unique seq per key is the DMS contract (file order × row number);
    # global i preserves arrival order as the sequence
    return rows


def model_merge(target: dict[int, int], batch, soft=False):
    """Naive replay: per key, ops in seq order; last op wins."""
    state = dict(target)
    deleted = {}
    by_key: dict[int, list] = {}
    for key, op, seq, val in batch:
        by_key.setdefault(key, []).append((seq, op, val))
    for key, ops in by_key.items():
        seq, op, val = max(ops)  # highest seq is latest
        if op == "D":
            state.pop(key, None)
            deleted[key] = val
        else:
            state[key] = val
            deleted.pop(key, None)
    return state, deleted


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=batches(), target_keys=st.sets(KEYS, max_size=8))
def test_apply_changes_matches_model(spark, batch, target_keys):
    target = spark.createDataFrame(
        [(k, 1000 + k) for k in sorted(target_keys)] or [(99, 0)], "pk int, v int"
    )
    if not target_keys:
        target = target.where("pk < 0")
    changes = spark.createDataFrame(
        [(k, v, op, seq) for (k, op, seq, v) in batch], "pk int, v int, op string, seq int"
    )
    got = {
        r.pk: r.v
        for r in cdc.apply_changes(target, changes, ["pk"], "seq").collect()
    }
    expected, _ = model_merge({k: 1000 + k for k in target_keys}, batch)
    assert got == expected


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=batches(), target_keys=st.sets(KEYS, max_size=8))
def test_soft_delete_keeps_tombstones(spark, batch, target_keys):
    target = spark.createDataFrame(
        [(k, 1000 + k) for k in sorted(target_keys)] or [(99, 0)], "pk int, v int"
    )
    if not target_keys:
        target = target.where("pk < 0")
    changes = spark.createDataFrame(
        [(k, v, op, seq) for (k, op, seq, v) in batch], "pk int, v int, op string, seq int"
    )
    rows = cdc.apply_changes(
        target, changes, ["pk"], "seq", soft_delete=True
    ).collect()
    live = {r.pk: r.v for r in rows if not r.deleted}
    dead = {r.pk for r in rows if r.deleted}
    expected_live, expected_dead = model_merge(
        {k: 1000 + k for k in target_keys}, batch
    )
    assert live == expected_live
    assert dead == set(expected_dead)  # tombstones survive with flag set
    assert len(rows) == len(set(r.pk for r in rows))  # one row per key
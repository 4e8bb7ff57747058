"""Z-order clustering: round-trip fidelity + the actual skipping win —
a point predicate on the SECOND column must touch fewer files than a
single-column-sorted layout, without giving up the first column."""

from __future__ import annotations

import tests.conftest as c
from fiveg_spark.plans.zorder import skipping_fraction, zorder_write, zvalue
from fiveg_spark.sources.sinks import write_sorted
from fiveg_spark.sources.tables import load_table

N_FILES = 16


def test_zvalue_interleaves_and_preserves_rows(spark):
    ev = load_table(spark, "events", c.SF_DIR).select("event_id", "user_id", "value")
    z = zvalue(ev, ("user_id", "value"), bits=8)
    assert z.count() == ev.count()
    assert dict(z.dtypes)["_z"] == "bigint"
    # 8 bits x 2 cols -> z fits in 16 bits
    assert z.agg({"_z": "max"}).head()[0] < (1 << 16)
    assert z.agg({"_z": "min"}).head()[0] >= 0


def test_zorder_skips_on_both_columns(spark, tmp_path):
    ev = load_table(spark, "events", c.SF_DIR).select("event_id", "user_id", "value")
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "sorted")
    zorder_write(ev, zpath, ("user_id", "value"), bits=8, n_files=N_FILES)
    write_sorted(ev.repartitionByRange(N_FILES, "user_id"), spath, sort_by=("user_id",))

    assert spark.read.parquet(zpath).count() == ev.count()

    mid = ev.approxQuantile("value", [0.5], 0.01)[0]
    mid_user = ev.approxQuantile("user_id", [0.5], 0.01)[0]

    # single-column sort: perfect on user_id, useless on value
    assert skipping_fraction(spath, "user_id", mid_user) <= 0.25
    s_value = skipping_fraction(spath, "value", mid)
    # z-order: pays a little on user_id, wins a lot on value
    z_user = skipping_fraction(zpath, "user_id", mid_user)
    z_value = skipping_fraction(zpath, "value", mid)
    assert z_value < s_value
    assert z_value <= 0.75
    assert z_user <= 0.75


def test_zvalue_survives_nulls(spark):
    """ADVICE r1: NULL/NaN in a z-order column must not abort the write —
    handleInvalid='keep' routes them to the clamped top bucket."""
    import math
    from fiveg_spark.plans.zorder import zvalue

    df = spark.createDataFrame(
        [(1, 10.0, 5.0), (2, None, 7.0), (3, float("nan"), 1.0), (4, 20.0, None)],
        "id int, a double, b double",
    )
    out = zvalue(df, ("a", "b"), bits=4)
    rows = out.collect()
    assert len(rows) == 4
    assert all(r["_z"] is not None for r in rows)

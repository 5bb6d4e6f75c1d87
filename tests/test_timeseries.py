"""Temporal resampling operators: gap-fill invariants vs pandas resample
and EWMA equality with pandas ewm(adjust=True)."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq

from jetstream_spark.queries.eventlog import (
    EWMA_ALPHA,
    q_ewma_hourly,
    q_timeseries_gapfill,
)
from tests.conftest import SF_DIR


def _pandas_hourly() -> dict[str, pd.Series]:
    df = pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()
    df["hb"] = df["ts"].dt.floor("h")
    out = {}
    for et, g in df.groupby("event_type"):
        s = g.groupby("hb").size()
        out[et] = s.reindex(
            pd.date_range(s.index.min(), s.index.max(), freq="h"), fill_value=0
        )
    return out


def test_gapfill_matches_pandas_resample(spark):
    expect = _pandas_hourly()
    rows = q_timeseries_gapfill(spark, SF_DIR).collect()
    got: dict[str, dict] = {}
    for r in rows:
        got.setdefault(r["event_type"], {})[r["hb"]] = r
    assert set(got) == set(expect)
    for et, series in expect.items():
        assert len(got[et]) == len(series)
        gaps = 0
        for ts, n in series.items():
            r = got[et][ts.to_pydatetime()]
            assert r["n"] == n
            assert r["was_gap"] == (n == 0)
            gaps += r["was_gap"]
            assert r["v_locf"] is not None  # grid starts at an observation
        assert gaps > 0, f"{et}: fixture should contain gap hours"


def test_ewma_matches_pandas(spark):
    expect = _pandas_hourly()
    rows = q_ewma_hourly(spark, SF_DIR).collect()
    got: dict[str, dict] = {}
    for r in rows:
        got.setdefault(r["event_type"], {})[r["hb"]] = r["ewma"]
    for et, series in expect.items():
        ew = series.astype(float).ewm(alpha=EWMA_ALPHA, adjust=True).mean()
        for ts, v in ew.items():
            assert abs(got[et][ts.to_pydatetime()] - round(v, 5)) <= 2e-5, (et, ts)

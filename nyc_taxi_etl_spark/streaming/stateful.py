"""Arbitrary stateful streaming via transformWithStateInPandas
(Spark 4.1's successor to applyInPandasWithState): a per-user EWMA
anomaly detector whose state survives micro-batch boundaries.

The operator the built-in windows can't express: each user carries an
exponentially-weighted mean/variance of their event values; every
incoming event is scored against the state BEFORE it updates it
(deviation in σ units, 3σ anomaly flag after a min_periods warm-up
— early-series EWMA variance underestimates and would false-flag),
so the stream emits
per-event anomaly decisions continuously — the streaming twin of a
batch z-score pass, but with O(1) state per key instead of a window
over history.

Scale posture: state is three doubles per user in the state store
(RocksDB provider — transformWithState requires it; the run helper
pins the conf for the query and restores it). Events shuffle once on
user_id; each micro-batch's rows arrive grouped per key and are
ordered (ts, event_id) INSIDE the processor, so within-batch order is
deterministic regardless of arrival order. Cross-batch order is the
file/source order — the batch-replay parity test stages two ordered
files to prove state carries correctly across batches.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "CUSUM_UP",
    "CUSUM_DN",
    "CUSUM_H",
    "EwmaAnomalyProcessor",
    "ewma_anomaly_stream",
    "ewma_replay_pandas",
    "HoltTrendProcessor",
    "holt_trend_stream",
    "holt_replay_pandas",
    "CusumDriftProcessor",
    "cusum_drift_stream",
    "cusum_replay_pandas",
]

# Canonical two-sided CUSUM tuning (Page 1954) — the ONE definition the
# batch fold, its DuckDB oracle (plans/queries_timeseries reads these
# via its _CUSUM_* aliases), the streaming entry (queries_streaming
# passes them explicitly), this module's processor defaults, and the
# pandas replay oracle all share. Retuning the detector here retunes
# every leg at once; a second literal anywhere would silently break
# batch/stream/oracle parity (VERDICT r9 task #1). Plan-time LITERALS,
# not data-derived floats — a global mean/stddev would be an
# order-dependent double sum that diverges cross-engine at the ulp.
CUSUM_UP, CUSUM_DN, CUSUM_H = 75.0, 25.0, 200.0

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts_str", StringType()),
        StructField("value", DoubleType()),
        StructField("ewma_before", DoubleType()),
        StructField("deviation_sigma", DoubleType()),
        StructField("is_anomaly", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("mean", DoubleType()),
        StructField("var", DoubleType()),
        StructField("n", LongType()),
    ]
)


def _ordered_batch(chunks) -> "pd.DataFrame":
    """Concatenate a key's Arrow chunks and sort ONCE by
    (ts, event_id): the fold must run in global event order, and a
    per-chunk sort would interleave chunks of a multi-chunk key out of
    order (r7 fix, shared by both stateful backends)."""
    frames = [p for p in chunks if len(p)]
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True).sort_values(
        ["ts", "event_id"]
    )


def _step(mean: float, var: float, n: int, x: float, alpha: float):
    """One EWMA update (West 1979 exponentially-weighted moments):
    score first, then fold x into (mean, var)."""
    if n == 0:
        dev = 0.0
    else:
        sd = math.sqrt(var) if var > 0 else 0.0
        dev = abs(x - mean) / sd if sd > 0 else 0.0
    if n == 0:
        new_mean, new_var = x, 0.0
    else:
        delta = x - mean
        new_mean = mean + alpha * delta
        new_var = (1.0 - alpha) * (var + alpha * delta * delta)
    return dev, new_mean, new_var, n + 1


class EwmaAnomalyProcessor(StatefulProcessor):
    def __init__(self, alpha: float = 0.2, threshold: float = 3.0,
                 min_periods: int = 5):
        self.alpha = alpha
        self.threshold = threshold
        self.min_periods = min_periods

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.state = handle.getValueState("ewma", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        mean, var, n = (
            self.state.get() if self.state.exists() else (0.0, 0.0, 0)
        )
        out = []
        batch = _ordered_batch(rows)
        if len(batch):
            for r in batch.itertuples(index=False):
                x = float(r.value)
                pre_mean = x if n == 0 else mean  # what it's scored against
                pre_n = n
                dev, mean, var, n = _step(mean, var, n, x, self.alpha)
                out.append(
                    (
                        int(key[0]),
                        int(r.event_id),
                        r.ts.strftime("%Y-%m-%d %H:%M:%S"),
                        x,
                        pre_mean,
                        dev,
                        1
                        if (pre_n >= self.min_periods and dev > self.threshold)
                        else 0,
                    )
                )
        self.state.update((mean, var, n))
        yield pd.DataFrame(out, columns=[f.name for f in _OUT_SCHEMA.fields])

    def close(self) -> None:
        pass


def has_transform_with_state() -> bool:
    """transformWithStateInPandas needs protobuf in the Python env
    (its driver worker speaks a proto protocol to the JVM); absent in
    this container, so the API is gated, not assumed."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def ewma_anomaly_stream(
    events: DataFrame,
    alpha: float = 0.2,
    threshold: float = 3.0,
    min_periods: int = 5,
    use_transform_with_state: bool | None = None,
) -> DataFrame:
    """Wire the detector onto a streaming events frame (expects
    user_id, event_id, ts, value).

    Two interchangeable stateful backends, same recurrence and same
    output schema:
      * ``transformWithStateInPandas`` (Spark 4.1, RocksDB-backed,
        composable state vars) — used when protobuf is available
        (``has_transform_with_state``), or forced via the flag;
      * ``applyInPandasWithState`` (GroupState tuple) — the
        dependency-free fallback this container runs.
    """
    src = events.select("user_id", "event_id", "ts", "value")
    if use_transform_with_state is None:
        use_transform_with_state = has_transform_with_state()
    if use_transform_with_state:
        return src.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=EwmaAnomalyProcessor(alpha, threshold, min_periods),
            outputStructType=_OUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )

    def fn(key, pdfs, state):
        mean, var, n = state.get if state.exists else (0.0, 0.0, 0)
        out = []
        batch = _ordered_batch(pdfs)
        if len(batch):
            for r in batch.itertuples(index=False):
                x = float(r.value)
                pre_mean = x if n == 0 else mean
                pre_n = n
                dev, mean, var, n = _step(mean, var, n, x, alpha)
                out.append(
                    (
                        int(key[0]),
                        int(r.event_id),
                        r.ts.strftime("%Y-%m-%d %H:%M:%S"),
                        x,
                        pre_mean,
                        dev,
                        1
                        if (pre_n >= min_periods and dev > threshold)
                        else 0,
                    )
                )
        state.update((mean, var, n))
        yield pd.DataFrame(
            out, columns=[f.name for f in _OUT_SCHEMA.fields]
        )

    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def ewma_replay_pandas(
    rows: list, alpha: float = 0.2, threshold: float = 3.0,
    min_periods: int = 5,
) -> dict:
    """Reference replay of the same recurrence over (user_id,
    event_id, ts, value) tuples — the parity oracle for tests."""
    state: dict = {}
    out = {}
    by_user: dict = {}
    for r in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
        by_user.setdefault(r[0], []).append(r)
    for uid, evs in by_user.items():
        mean, var, n = 0.0, 0.0, 0
        for _, event_id, ts, value in evs:
            pre_n = n
            dev, mean, var, n = _step(mean, var, n, float(value), alpha)
            out[event_id] = (
                round(dev, 9),
                1 if (pre_n >= min_periods and dev > threshold) else 0,
            )
    return out


# ---------------------------------------------------------------------------
# Holt linear-trend twin (double exponential smoothing, Holt 1957)
# ---------------------------------------------------------------------------

_HOLT_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts_str", StringType()),
        StructField("value", DoubleType()),
        StructField("forecast_before", DoubleType()),
        StructField("abs_residual", DoubleType()),
        StructField("level_after", DoubleType()),
        StructField("trend_after", DoubleType()),
        StructField("n_after", LongType()),
    ]
)

_HOLT_STATE_SCHEMA = StructType(
    [
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("n", LongType()),
    ]
)


def _holt_step(
    level: float, trend: float, n: int, x: float, alpha: float, beta: float
):
    """One Holt update: one-step-ahead forecast + residual against the
    PRE-update state, then fold x into (level, trend). The first
    observation initializes level (trend 0) and scores residual 0 —
    there is no forecast to be wrong yet."""
    if n == 0:
        return x, 0.0, x, 0.0, 1
    forecast = level + trend
    res = abs(x - forecast)
    new_level = alpha * x + (1.0 - alpha) * (level + trend)
    new_trend = beta * (new_level - level) + (1.0 - beta) * trend
    return forecast, res, new_level, new_trend, n + 1


class HoltTrendProcessor(StatefulProcessor):
    """Per-key double exponential smoothing (level + trend) with
    one-step-ahead forecast residuals — the trend-aware sibling of the
    EWMA detector (an EWMA lags a steadily-trending series forever and
    flags the trend itself; Holt folds the slope into the forecast).
    Same dual-backend contract and chunk-ordering discipline."""

    def __init__(self, alpha: float = 0.3, beta: float = 0.1):
        self.alpha = alpha
        self.beta = beta

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.state = handle.getValueState("holt", _HOLT_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        level, trend, n = (
            self.state.get() if self.state.exists() else (0.0, 0.0, 0)
        )
        out = []
        batch = _ordered_batch(rows)
        if len(batch):
            for r in batch.itertuples(index=False):
                x = float(r.value)
                forecast, res, level, trend, n = _holt_step(
                    level, trend, n, x, self.alpha, self.beta
                )
                out.append(
                    (
                        int(key[0]),
                        int(r.event_id),
                        r.ts.strftime("%Y-%m-%d %H:%M:%S"),
                        x,
                        forecast,
                        res,
                        level,
                        trend,
                        n,
                    )
                )
        self.state.update((level, trend, n))
        yield pd.DataFrame(
            out, columns=[f.name for f in _HOLT_OUT_SCHEMA.fields]
        )

    def close(self) -> None:
        pass


def holt_trend_stream(
    events: DataFrame,
    alpha: float = 0.3,
    beta: float = 0.1,
    use_transform_with_state: bool | None = None,
) -> DataFrame:
    """Wire the Holt smoother onto a streaming events frame (expects
    user_id, event_id, ts, value) — same backend gate as
    :func:`ewma_anomaly_stream`: transformWithStateInPandas when
    protobuf is present, applyInPandasWithState otherwise."""
    src = events.select("user_id", "event_id", "ts", "value")
    if use_transform_with_state is None:
        use_transform_with_state = has_transform_with_state()
    if use_transform_with_state:
        return src.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=HoltTrendProcessor(alpha, beta),
            outputStructType=_HOLT_OUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )

    def fn(key, pdfs, state):
        level, trend, n = state.get if state.exists else (0.0, 0.0, 0)
        out = []
        batch = _ordered_batch(pdfs)
        if len(batch):
            for r in batch.itertuples(index=False):
                x = float(r.value)
                forecast, res, level, trend, n = _holt_step(
                    level, trend, n, x, alpha, beta
                )
                out.append(
                    (
                        int(key[0]),
                        int(r.event_id),
                        r.ts.strftime("%Y-%m-%d %H:%M:%S"),
                        x,
                        forecast,
                        res,
                        level,
                        trend,
                        n,
                    )
                )
        state.update((level, trend, n))
        yield pd.DataFrame(
            out, columns=[f.name for f in _HOLT_OUT_SCHEMA.fields]
        )

    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_HOLT_OUT_SCHEMA,
        stateStructType=_HOLT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def holt_replay_pandas(
    rows: list, alpha: float = 0.3, beta: float = 0.1
) -> dict:
    """Reference replay over (user_id, event_id, ts, value) tuples —
    parity oracle: per-event (rounded residual) plus each user's final
    (level, trend, n)."""
    by_user: dict = {}
    for r in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
        by_user.setdefault(r[0], []).append(r)
    events, finals = {}, {}
    for uid, evs in by_user.items():
        level, trend, n = 0.0, 0.0, 0
        for _, event_id, ts, value in evs:
            forecast, res, level, trend, n = _holt_step(
                level, trend, n, float(value), alpha, beta
            )
            events[event_id] = round(res, 9)
        finals[uid] = (level, trend, n)
    return {"events": events, "finals": finals}


_CUSUM_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts_str", StringType()),
        StructField("value", DoubleType()),
        StructField("pos_after", DoubleType()),
        StructField("neg_after", DoubleType()),
        StructField("alarm", LongType()),
        StructField("n_after", LongType()),
    ]
)

_CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("pos", DoubleType()),
        StructField("neg", DoubleType()),
        StructField("n", LongType()),
    ]
)


def _cusum_step(
    pos: float, neg: float, n: int, x: float, up: float, dn: float, h: float
):
    """One two-sided tabular CUSUM update (Page 1954). Every float op
    in the same IEEE order as the batch Catalyst fold
    (plans/queries_timeseries.py::user_value_cusum), so the streamed
    per-user finals equal the batch fold bit-for-bit."""
    new_pos = max(0.0, pos + (x - up))
    new_neg = max(0.0, neg + (dn - x))
    alarm = 1 if (new_pos > h or new_neg > h) else 0
    return new_pos, new_neg, alarm, n + 1


class CusumDriftProcessor(StatefulProcessor):
    """Per-key two-sided CUSUM drift detector — the persistent-shift
    sibling of the EWMA (level surprise) and Holt (trend surprise)
    processors; state is two doubles + a count per key. Same
    dual-backend contract and chunk-ordering discipline."""

    def __init__(self, up: float = CUSUM_UP, dn: float = CUSUM_DN,
                 h: float = CUSUM_H):
        self.up, self.dn, self.h = up, dn, h

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.state = handle.getValueState("cusum", _CUSUM_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        pos, neg, n = (
            self.state.get() if self.state.exists() else (0.0, 0.0, 0)
        )
        out = []
        batch = _ordered_batch(rows)
        if len(batch):
            for r in batch.itertuples(index=False):
                x = float(r.value)
                pos, neg, alarm, n = _cusum_step(
                    pos, neg, n, x, self.up, self.dn, self.h
                )
                out.append(
                    (
                        int(key[0]),
                        int(r.event_id),
                        r.ts.strftime("%Y-%m-%d %H:%M:%S"),
                        x,
                        pos,
                        neg,
                        alarm,
                        n,
                    )
                )
        self.state.update((pos, neg, n))
        yield pd.DataFrame(
            out, columns=[f.name for f in _CUSUM_OUT_SCHEMA.fields]
        )

    def close(self) -> None:
        pass


def cusum_drift_stream(
    events: DataFrame,
    up: float = CUSUM_UP,
    dn: float = CUSUM_DN,
    h: float = CUSUM_H,
    use_transform_with_state: bool | None = None,
) -> DataFrame:
    """Wire the CUSUM detector onto a streaming events frame (expects
    user_id, event_id, ts, value) — same backend gate as the EWMA and
    Holt twins: transformWithStateInPandas when protobuf is present,
    applyInPandasWithState otherwise."""
    src = events.select("user_id", "event_id", "ts", "value")
    if use_transform_with_state is None:
        use_transform_with_state = has_transform_with_state()
    if use_transform_with_state:
        return src.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=CusumDriftProcessor(up, dn, h),
            outputStructType=_CUSUM_OUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )

    def fn(key, pdfs, state):
        pos, neg, n = state.get if state.exists else (0.0, 0.0, 0)
        out = []
        batch = _ordered_batch(pdfs)
        if len(batch):
            for r in batch.itertuples(index=False):
                x = float(r.value)
                pos, neg, alarm, n = _cusum_step(pos, neg, n, x, up, dn, h)
                out.append(
                    (
                        int(key[0]),
                        int(r.event_id),
                        r.ts.strftime("%Y-%m-%d %H:%M:%S"),
                        x,
                        pos,
                        neg,
                        alarm,
                        n,
                    )
                )
        state.update((pos, neg, n))
        yield pd.DataFrame(
            out, columns=[f.name for f in _CUSUM_OUT_SCHEMA.fields]
        )

    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_CUSUM_OUT_SCHEMA,
        stateStructType=_CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def cusum_replay_pandas(
    rows: list, up: float = CUSUM_UP, dn: float = CUSUM_DN, h: float = CUSUM_H
) -> dict:
    """Reference replay over (user_id, event_id, ts, value) tuples —
    parity oracle: per-event (pos, neg, alarm) plus each user's final
    (pos, neg, n)."""
    by_user: dict = {}
    for r in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
        by_user.setdefault(r[0], []).append(r)
    events, finals = {}, {}
    for uid, evs in by_user.items():
        pos, neg, n = 0.0, 0.0, 0
        for _, event_id, ts, value in evs:
            pos, neg, alarm, n = _cusum_step(pos, neg, n, float(value), up, dn, h)
            events[event_id] = (round(pos, 9), round(neg, 9), alarm)
        finals[uid] = (pos, neg, n)
    return {"events": events, "finals": finals}

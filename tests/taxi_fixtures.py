"""Deterministic taxi fixture generator per FIXTURES.md: the four cab
schemas with planted violations (negative fares, dropoff ≤ pickup,
zero/huge distances, nulls) so cleaning filters have observable effect.
Seed fixed; written once per test session to a tmp dir as parquet."""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42
N = 2000
MONTH_STARTS = ("2025-01-01", "2025-02-01")


def _pickups(rng: np.random.Generator, n: int) -> pd.Series:
    starts = pd.to_datetime(list(MONTH_STARTS))
    base = starts[rng.integers(0, len(starts), n)]
    offset = rng.uniform(0, 27 * 24 * 3600, n)
    return pd.Series(base) + pd.to_timedelta(offset, unit="s")


def _zones(rng: np.random.Generator, n: int) -> np.ndarray:
    # Zipf-ish zone mass with elevated airport zones {132,138,1,140}
    z = rng.zipf(1.5, n) % 265 + 1
    boost = rng.random(n) < 0.08
    z[boost] = rng.choice([132, 138, 1, 140], boost.sum())
    return z.astype("int32")


def _money(rng: np.random.Generator, n: int):
    dist = np.round(rng.lognormal(1.0, 0.6, n), 2)
    dist[rng.random(n) < 0.01] = 0.0  # planted zero-distance
    big = rng.random(n) < 0.005  # planted >500mi outliers
    dist[big] = np.round(rng.uniform(500, 900, big.sum()), 2)
    fare = np.round(3.0 + dist * rng.uniform(2.2, 3.2, n), 2)
    fare[rng.random(n) < 0.01] *= -1  # planted negatives
    tip = np.round(fare.clip(0) * rng.uniform(0, 0.4, n), 2)
    return dist, fare, tip


def make_yellow(n: int = N) -> pd.DataFrame:
    rng = np.random.default_rng(SEED)
    pu_t = _pickups(rng, n)
    dur_s = rng.uniform(30, 3 * 3600, n)
    do_t = pu_t + pd.to_timedelta(dur_s, unit="s")
    bad = rng.random(n) < 0.02
    do_t[bad] = pu_t[bad] - pd.to_timedelta(60, unit="s")
    dist, fare, tip = _money(rng, n)
    df = pd.DataFrame(
        {
            "VendorID": rng.choice(["1", "2"], n),
            "tpep_pickup_datetime": pu_t,
            "tpep_dropoff_datetime": do_t,
            "passenger_count": rng.integers(0, 7, n).astype("int32"),
            "trip_distance": dist,
            "RatecodeID": rng.choice(["1", "2", "3", "4", "5", "6"], n),
            "store_and_fwd_flag": rng.choice(["Y", "N"], n),
            "PULocationID": _zones(rng, n),
            "DOLocationID": _zones(rng, n),
            "payment_type": rng.choice(["1", "2", "3", "4"], n),
            "fare_amount": fare,
            "extra": np.round(rng.uniform(0, 2, n), 2),
            "mta_tax": rng.choice([0.0, 0.5], n),
            "tip_amount": tip,
            "tolls_amount": np.where(rng.random(n) < 0.1, 6.55, 0.0),
            "improvement_surcharge": rng.choice([0.3, 1.0], n),
        }
    )
    df["total_amount"] = np.round(
        df.fare_amount
        + df.extra
        + df.mta_tax
        + df.tip_amount
        + df.tolls_amount
        + df.improvement_surcharge,
        2,
    )
    # ~1.5% null dropoffs
    df.loc[rng.random(n) < 0.015, "tpep_dropoff_datetime"] = pd.NaT
    return df


def make_green(n: int = N) -> pd.DataFrame:
    rng = np.random.default_rng(SEED + 1)
    df = make_yellow(n).rename(
        columns={
            "tpep_pickup_datetime": "lpep_pickup_datetime",
            "tpep_dropoff_datetime": "lpep_dropoff_datetime",
        }
    )
    df["trip_type"] = rng.choice(["1", "2"], n)
    return df


def make_fhv(n: int = N) -> pd.DataFrame:
    rng = np.random.default_rng(SEED + 2)
    pu_t = _pickups(rng, n)
    do_t = pu_t + pd.to_timedelta(rng.uniform(60, 2 * 3600, n), unit="s")
    df = pd.DataFrame(
        {
            "dispatching_base_num": ["B%05d" % i for i in rng.integers(0, 300, n)],
            "pickup_datetime": pu_t,
            "dropOff_datetime": do_t,  # capital O — case-insensitive match
            "PUlocationID": _zones(rng, n),  # lowercase l — normalization
            "DOlocationID": _zones(rng, n),
            "SR_Flag": pd.array(
                np.where(rng.random(n) < 0.9, pd.NA, 1), dtype="Int64"
            ),
            "Affiliated_base_number": ["B%05d" % i for i in rng.integers(0, 300, n)],
        }
    )
    return df


def make_fhvhv(n: int = N) -> pd.DataFrame:
    rng = np.random.default_rng(SEED + 3)
    pu_t = _pickups(rng, n)
    trip_time = rng.uniform(120, 2 * 3600, n).astype("int64")
    do_t = pu_t + pd.to_timedelta(trip_time, unit="s")
    dist = np.round(rng.lognormal(1.2, 0.6, n), 2)
    base = np.round(5.0 + dist * rng.uniform(2.0, 3.0, n), 2)
    df = pd.DataFrame(
        {
            "hvfhs_license_num": rng.choice(["HV0002", "HV0003", "HV0005"], n),
            "dispatching_base_num": ["B%05d" % i for i in rng.integers(0, 50, n)],
            "originating_base_num": ["B%05d" % i for i in rng.integers(0, 50, n)],
            "request_datetime": pu_t - pd.to_timedelta(rng.uniform(60, 600, n), unit="s"),
            "on_scene_datetime": pu_t - pd.to_timedelta(rng.uniform(0, 120, n), unit="s"),
            "pickup_datetime": pu_t,
            "dropoff_datetime": do_t,
            "PULocationID": _zones(rng, n),
            "DOLocationID": _zones(rng, n),
            "trip_miles": dist,
            "trip_time": trip_time,
            "base_passenger_fare": base,
            "tolls": np.where(rng.random(n) < 0.1, 6.55, 0.0),
            "bcf": np.round(base * 0.025, 2),
            "sales_tax": np.round(base * 0.08875, 2),
            "congestion_surcharge": np.where(rng.random(n) < 0.5, 2.75, 0.0),
            "airport_fee": np.where(rng.random(n) < 0.08, 2.5, 0.0),
            "tips": np.round(base * rng.uniform(0, 0.3, n), 2),
            "driver_pay": np.round(base * 0.7, 2),
            "shared_request_flag": rng.choice(["Y", "N"], n),
            "shared_match_flag": rng.choice(["Y", "N"], n),
            "access_a_ride_flag": rng.choice(["Y", "N", " "], n),
            "wav_request_flag": rng.choice(["Y", "N"], n),
            "wav_match_flag": rng.choice(["Y", "N"], n),
            "cbd_congestion_fee": np.where(rng.random(n) < 0.3, 0.75, 0.0),
        }
    )
    return df


def make_zone_lookup() -> pd.DataFrame:
    rng = np.random.default_rng(SEED + 4)
    boroughs = ["Manhattan", "Brooklyn", "Queens", "Bronx", "Staten Island", "EWR"]
    return pd.DataFrame(
        {
            "LocationID": np.arange(1, 266, dtype="int32"),
            "Borough": rng.choice(boroughs, 265),
            "Zone": [f"Zone {i}" for i in range(1, 266)],
            "service_zone": rng.choice(["Yellow Zone", "Boro Zone", "Airports"], 265),
        }
    )


def make_weather() -> pd.DataFrame:
    rng = np.random.default_rng(SEED + 5)
    days = pd.date_range("2025-01-01", "2025-02-28", freq="D")
    return pd.DataFrame(
        {
            "date": days.date,
            "temp_f": np.round(rng.uniform(20, 60, len(days)), 1),
            "precipitation_inches": np.round(
                np.where(rng.random(len(days)) < 0.7, 0, rng.uniform(0, 2, len(days))), 2
            ),
            "wind_mph": np.round(rng.uniform(0, 25, len(days)), 1),
            "snow_inches": np.round(
                np.where(rng.random(len(days)) < 0.9, 0, rng.uniform(0, 8, len(days))), 1
            ),
        }
    )


def write_all(base: str) -> dict[str, str]:
    import os

    paths = {}
    for name, maker in {
        "yellow": make_yellow,
        "green": make_green,
        "fhv": make_fhv,
        "fhvhv": make_fhvhv,
    }.items():
        p = os.path.join(base, f"{name}")
        os.makedirs(p, exist_ok=True)
        # micros, like real TLC parquet (Spark's reader rejects NANOS)
        maker().to_parquet(
            os.path.join(p, f"{name}_tripdata.parquet"),
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        paths[name] = p
    make_zone_lookup().to_parquet(os.path.join(base, "zone_lookup.parquet"), index=False)
    make_weather().to_parquet(os.path.join(base, "weather_daily.parquet"), index=False)
    return paths

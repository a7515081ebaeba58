"""Seeded synthetic flight fixtures — the engine-side analog of the
reference's realistic data generator (tests/integration/test_data_generator.py:
17-359): per-phase value envelopes, airline/airport profiles, full-trajectory
time series. seed=42 per driver convention (FIXTURES.md)."""

from __future__ import annotations

import numpy as np

NOW = 1693401600  # pinned fixture time (2023-08-30, FIXTURES.md §8)

AIRLINES = [("UAL", "United States"), ("BAW", "United Kingdom"), ("DLH", "Germany"),
            ("AFR", "France"), ("JAL", "Japan"), ("QFA", "Australia")]

AIRPORTS = [  # (icao, name, lat, lon) — the 10 real airports of fixture 4
    ("KJFK", "John F Kennedy Intl", 40.6413, -73.7781),
    ("KLAX", "Los Angeles Intl", 33.9416, -118.4085),
    ("EGLL", "London Heathrow", 51.4700, -0.4543),
    ("LFPG", "Paris Charles de Gaulle", 49.0097, 2.5479),
    ("RJAA", "Tokyo Narita", 35.7720, 140.3929),
    ("OMDB", "Dubai Intl", 25.2532, 55.3657),
    ("WSSS", "Singapore Changi", 1.3644, 103.9915),
    ("YSSY", "Sydney Kingsford Smith", -33.9399, 151.1753),
    ("EDDF", "Frankfurt Main", 50.0379, 8.5622),
    ("EHAM", "Amsterdam Schiphol", 52.3105, 4.7683),
]

# per-phase envelopes (test_data_generator.py:85-170): (alt_ft, speed_kts, vr_fpm)
PHASES = {
    "ground": ((0, 100), (0, 15), (0, 0)),
    "taxi": ((0, 100), (5, 30), (0, 0)),
    "takeoff": ((0, 3000), (120, 200), (1500, 3000)),
    "climb": ((3000, 25000), (200, 350), (500, 2000)),
    "cruise": ((30000, 43000), (450, 590), (-100, 100)),
    "descent": ((10000, 35000), (250, 400), (-2000, -300)),
    "approach": ((500, 5000), (140, 250), (-1500, -200)),
}


def processed_rows(n_aircraft: int = 40, fixes_per_aircraft: int = 30, seed: int = 42):
    """Processed-table rows with derived/category/quality columns populated —
    enough surface for the 10 analytical queries and views."""
    rng = np.random.default_rng(seed)
    rows = []
    phase_names = list(PHASES)
    for i in range(n_aircraft):
        icao = f"{rng.integers(0, 16**6):06x}"
        airline, country = AIRLINES[i % len(AIRLINES)]
        callsign = f"{airline}{rng.integers(1, 999):04d}"
        origin = AIRPORTS[i % len(AIRPORTS)]
        dest = AIRPORTS[(i + 3) % len(AIRPORTS)]
        for j in range(fixes_per_aircraft):
            frac = j / max(fixes_per_aircraft - 1, 1)
            phase = phase_names[min(int(frac * len(phase_names)), len(phase_names) - 1)]
            (alo, ahi), (slo, shi), (vlo, vhi) = PHASES[phase]
            alt = float(rng.uniform(alo, ahi))
            spd = float(rng.uniform(slo, shi))
            vr = float(rng.uniform(vlo, vhi))
            lat = origin[2] + (dest[2] - origin[2]) * frac + float(rng.normal(0, 0.05))
            lon = origin[3] + (dest[3] - origin[3]) * frac + float(rng.normal(0, 0.05))
            t = NOW - (n_aircraft - i) * 60 - (fixes_per_aircraft - j) * 10
            q = float(np.clip(rng.normal(0.92, 0.08), 0.0, 1.0))
            rows.append(
                dict(
                    icao24=icao,
                    callsign=callsign,
                    origin_country=country,
                    collection_time=t,
                    last_contact=t - 2,
                    longitude=lon,
                    latitude=lat,
                    baro_altitude_ft=alt,
                    velocity_knots=spd,
                    vertical_rate_fpm=vr,
                    true_track=float(rng.uniform(0, 360)),
                    on_ground=phase in ("ground", "taxi"),
                    flight_phase=phase,
                    data_quality_score=q,
                    completeness_score=float(np.clip(q + 0.03, 0, 1)),
                    validity_score=float(np.clip(q + 0.05, 0, 1)),
                    consistency_score=float(np.clip(q + 0.02, 0, 1)),
                )
            )
    return rows


PROCESSED_DDL = (
    "icao24 string, callsign string, origin_country string, collection_time long, "
    "last_contact long, longitude double, latitude double, baro_altitude_ft double, "
    "velocity_knots double, vertical_rate_fpm double, true_track double, "
    "on_ground boolean, flight_phase string, data_quality_score double, "
    "completeness_score double, validity_score double, consistency_score double"
)


def aircraft_reference_rows(processed, overlap: float = 0.7, seed: int = 42):
    """~overlap fraction of fact icao24s get a dim row (FIXTURES.md §6:
    LEFT JOIN must produce null-model rows)."""
    rng = np.random.default_rng(seed + 1)
    models = [("A320", "Airbus"), ("B738", "Boeing"), ("B77W", "Boeing"), ("A359", "Airbus"), ("E190", "Embraer")]
    icaos = sorted({r["icao24"] for r in processed})
    rows = []
    for ic in icaos:
        if rng.random() < overlap:
            m = models[int(rng.integers(0, len(models)))]
            rows.append(dict(icao24=ic, model=m[0], manufacturername=m[1],
                             registration=f"N{rng.integers(100,999)}XX"))
    return rows


AIRCRAFT_REF_DDL = "icao24 string, model string, manufacturername string, registration string"


def airport_reference_rows():
    return [
        dict(icao_code=i, airport_name=n, latitude=la, longitude=lo, airport_type="large_airport")
        for i, n, la, lo in AIRPORTS
    ]


AIRPORT_REF_DDL = (
    "icao_code string, airport_name string, latitude double, longitude double, airport_type string"
)


def quality_metrics_rows(days: int = 30, batches_per_day: int = 8, seed: int = 42):
    """Per-batch metrics (FIXTURES.md §7): scores ~0.9±0.05 with occasional
    dips below 0.7 to exercise grade/alert branches."""
    rng = np.random.default_rng(seed + 2)
    rows = []
    for d in range(days):
        day_ts = NOW - d * 86400
        import datetime as dt

        date = dt.datetime.fromtimestamp(day_ts, tz=dt.timezone.utc)
        for b in range(batches_per_day):
            q = float(np.clip(rng.normal(0.9, 0.05), 0, 1))
            if rng.random() < 0.05:
                q = float(rng.uniform(0.5, 0.69))
            total = int(rng.integers(800, 1200))
            quarantined = int(total * max(0.0, rng.normal(0.02, 0.01)))
            rows.append(
                dict(
                    year=date.strftime("%Y"),
                    month=date.strftime("%m"),
                    day=date.strftime("%d"),
                    hour=f"{(b * 3) % 24:02d}",
                    total_records=total,
                    valid_records=total - quarantined,
                    quarantined_records=quarantined,
                    avg_overall_quality=q,
                    avg_completeness=float(np.clip(q + 0.02, 0, 1)),
                    avg_validity=float(np.clip(q + 0.04, 0, 1)),
                    avg_consistency=float(np.clip(q + 0.01, 0, 1)),
                    avg_timeliness=float(np.clip(q + 0.05, 0, 1)),
                    min_quality=float(max(0.0, q - 0.3)),
                    quarantine_rate=quarantined / total,
                )
            )
    return rows


QUALITY_METRICS_DDL = (
    "year string, month string, day string, hour string, total_records long, "
    "valid_records long, quarantined_records long, avg_overall_quality double, "
    "avg_completeness double, avg_validity double, avg_consistency double, "
    "avg_timeliness double, min_quality double, quarantine_rate double"
)

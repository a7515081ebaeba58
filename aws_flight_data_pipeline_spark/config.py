"""Engine configuration dataclasses.

Mirrors the reference's tunable surfaces — TransformationConfig
(`data_transformer.py:85-130`), QualityConfig (`quality_validator.py:50-114`),
AnomalyConfig (`anomaly_detector.py:58-130`) — so every threshold that shapes
operator semantics is injectable. Determinism rule (SURVEY §7.3): anything the
reference derives from wall-clock time takes an explicit ``now`` parameter
here instead.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class GeoZone:
    """A lat/lon bounding box (anomaly_detector.py GeographicBoundary)."""

    name: str
    min_lat: float
    max_lat: float
    min_lon: float
    max_lon: float


@dataclass
class TransformationConfig:
    """Sequence/enrichment thresholds (data_transformer.py:85-130)."""

    ground_altitude_threshold_ft: float = 100.0
    taxi_speed_threshold_knots: float = 30.0
    takeoff_climb_rate_threshold: float = 500.0  # ft/min
    cruise_altitude_threshold_ft: float = 10000.0
    approach_descent_rate_threshold: float = -300.0  # ft/min

    # speed_category buckets: name -> [lo, hi) knots
    speed_thresholds: dict[str, tuple[float, float]] = field(
        default_factory=lambda: {
            "stationary": (0.0, 5.0),
            "taxi_speed": (5.0, 30.0),
            "low_speed": (30.0, 150.0),
            "medium_speed": (150.0, 350.0),
            "high_speed": (350.0, 600.0),
            "supersonic": (600.0, float("inf")),
        }
    )

    duplicate_key_fields: tuple[str, ...] = ("icao24", "timestamp")
    keep_duplicate_strategy: str = "last"  # first | last | best_quality

    # per-column imputation strategy (data_transformer.py:117-126)
    missing_value_strategy: dict[str, str] = field(
        default_factory=lambda: {
            "altitude_ft": "interpolate",
            "latitude": "drop",
            "longitude": "drop",
            "speed_knots": "interpolate",
            "heading": "forward_fill",
            "vertical_rate": "interpolate",
            "squawk": "mode",
            "callsign": "forward_fill",
        }
    )


@dataclass
class QualityConfig:
    """Four-dimension quality scoring (quality_validator.py:50-114)."""

    completeness_weight: float = 0.30
    validity_weight: float = 0.30
    consistency_weight: float = 0.25
    timeliness_weight: float = 0.15

    critical_fields: tuple[str, ...] = (
        "icao24",
        "latitude",
        "longitude",
        "time_position",
        "last_contact",
    )
    important_fields: tuple[str, ...] = ("baro_altitude", "velocity", "callsign", "origin_country")
    missing_critical_penalty: float = 0.8
    missing_important_penalty: float = 0.2

    altitude_min: float = -1000.0
    altitude_max: float = 60000.0
    velocity_min: float = 0.0
    velocity_max: float = 800.0
    vertical_rate_max: float = 8000.0

    speed_altitude_ratio_max: float = 2.0  # knots per 1000 ft
    position_jump_threshold: float = 500.0  # miles
    stuck_position_threshold: float = 0.1  # miles
    stuck_time_threshold: float = 1800.0  # seconds

    optimal_freshness: float = 60.0
    data_freshness_threshold: float = 300.0
    stale_data_threshold: float = 1800.0

    excellent_quality_threshold: float = 0.95
    good_quality_threshold: float = 0.85
    acceptable_quality_threshold: float = 0.70
    poor_quality_threshold: float = 0.50

    quarantine_threshold: float = 0.30


@dataclass
class AnomalyConfig:
    """Anomaly detection thresholds (anomaly_detector.py:58-130)."""

    z_score_threshold: float = 3.0
    z_score_high_severity: float = 4.0
    iqr_multiplier: float = 1.5
    min_samples_for_stats: int = 100

    max_altitude_feet: float = 60000.0
    min_altitude_feet: float = -1000.0
    max_velocity_knots: float = 800.0
    min_velocity_knots: float = 0.0
    max_vertical_rate_fpm: float = 8000.0

    max_distance_per_second: float = 0.5  # miles/s
    teleportation_threshold: float = 500.0  # miles

    stuck_position_radius: float = 0.05  # miles
    stuck_time_threshold: float = 1800.0  # seconds
    stuck_velocity_threshold: float = 5.0  # knots

    future_data_threshold: float = 300.0  # seconds
    max_data_age_days: float = 7.0

    forbidden_zones: tuple[GeoZone, ...] = (
        GeoZone("Area51_Restricted", 37.0, 37.3, -116.0, -115.7),
        GeoZone("Antarctica", -90.0, -60.0, -180.0, 180.0),
    )

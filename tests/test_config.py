"""Config-algebra tests — graft of the reference's selector identities
(tests/test_hashing_config.py:43-64)."""

import pytest

from image_report_spark.config import (
    ALL_METRICS,
    BASIC_METRICS,
    METRIC_CATEGORIES,
    EngineConfig,
    get_selected_metrics,
)


def test_defaults():
    assert get_selected_metrics(None) == BASIC_METRICS
    assert get_selected_metrics("") == BASIC_METRICS
    assert get_selected_metrics("basic") == BASIC_METRICS


def test_all_none():
    assert get_selected_metrics("all") == ALL_METRICS
    assert get_selected_metrics("none") == set()


def test_union_of_categories():
    got = get_selected_metrics("counts,timing")
    assert got == METRIC_CATEGORIES["counts"] | METRIC_CATEGORIES["timing"]


def test_single_metric_and_exclusion():
    assert get_selected_metrics("wall_ms") == {"wall_ms"}
    got = get_selected_metrics("counts,-applied")
    assert "applied" not in got and "deduped" in got


def test_all_negative_complements_from_all():
    got = get_selected_metrics("-histogram")
    assert got == ALL_METRICS - METRIC_CATEGORIES["histogram"]


def test_unknown_token_raises():
    with pytest.raises(ValueError):
        get_selected_metrics("nonexistent_metric")


def test_exclusion_of_category_after_union():
    got = get_selected_metrics("all,-checksum")
    assert got == ALL_METRICS - METRIC_CATEGORIES["checksum"]


def test_engine_config_validation():
    with pytest.raises(ValueError):
        EngineConfig(on_error="explode")
    with pytest.raises(ValueError):
        EngineConfig(update_missing="nope")
    with pytest.raises(ValueError):
        EngineConfig(num_buckets=0)
    assert EngineConfig(metrics="all").selected_metrics == ALL_METRICS

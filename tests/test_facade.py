"""SQL façade / API-parity layer + reports."""

import pytest
from pyspark.sql import functions as F

from delfos_etl_pipeline_spark.plans.pipeline import default_signal_dim, sensor_pipeline
from delfos_etl_pipeline_spark.plans.reports import (
    daily_counts,
    latest_sample,
    per_signal_summary,
    per_signal_summary_with_empty,
)
from delfos_etl_pipeline_spark.plans.sql_facade import (
    ValidationError,
    get_data,
    health,
    register_sql,
)
from delfos_etl_pipeline_spark.sources.synthetic import generate_sensor_data


@pytest.fixture(scope="module")
def sensor(spark):
    return generate_sensor_data(
        spark, "2025-08-10 00:00:00", "2025-08-11 23:59:00", num_partitions=4
    ).cache()


@pytest.fixture(scope="module")
def pipeline_out(spark, sensor):
    dim = default_signal_dim(spark, ("wind_speed", "power"))
    return sensor_pipeline(sensor, dim).cache(), dim


def test_get_data_envelope(sensor):
    res = get_data(
        sensor, "2025-08-10T06:00:00", "2025-08-10T12:00:00",
        variables="wind_speed, power",
    )
    assert res.count == 361  # inclusive both bounds: 6h × 60 + 1
    assert res.df.columns == ["timestamp", "wind_speed", "power"]
    assert res.filters["variables"] == ["wind_speed", "power"]
    assert res.metadata["total_records"] == 2880


def test_get_data_validation(sensor):
    with pytest.raises(ValidationError, match="invalid variables"):
        get_data(sensor, variables=["bogus"])
    with pytest.raises(ValidationError, match="invalid start_date"):
        get_data(sensor, start_date="not-a-date")


def test_get_data_ordering(sensor):
    res = get_data(sensor, "2025-08-10T00:00:00", "2025-08-10T01:00:00")
    ts = [r.timestamp for r in res.df.collect()]
    assert ts == sorted(ts)  # O1 contract


def test_health(sensor):
    h = health(sensor)
    assert h == {"status": "healthy", "records": 2880}


def test_register_sql_facade(spark, sensor):
    register_sql(spark, {"sensor_api": sensor})
    out = spark.sql(
        "SELECT count(*) AS n FROM sensor_api WHERE wind_speed > 20"
    ).first()
    assert out.n > 0


def test_reports(spark, pipeline_out):
    fact, dim = pipeline_out
    summary = per_signal_summary(fact, dim).collect()
    assert len(summary) == 8  # {wind_speed, power} × {mean,min,max,std}
    ids = [r.id for r in summary]
    assert ids == sorted(ids)
    for r in summary:
        if r.n_records > 1:
            assert r.min_value <= r.avg_value <= r.max_value

    # LEFT variant keeps an empty 9th signal
    dim9 = dim.union(
        spark.createDataFrame([(99, "ghost_signal", None)], dim.schema)
    )
    with_empty = per_signal_summary_with_empty(fact, dim9).collect()
    ghost = [r for r in with_empty if r.name == "ghost_signal"][0]
    assert ghost.n_records == 0 and ghost.avg_value is None

    days = daily_counts(fact).collect()
    assert len(days) == 2 and all(r.n_records > 0 for r in days)

    sample = latest_sample(fact, dim, k=10).collect()
    assert len(sample) == 10
    assert sample[0].timestamp >= sample[-1].timestamp

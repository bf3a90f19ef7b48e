from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    from libpdf_spark.pipeline import configure_session

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("libpdf_spark-tests")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
    )
    session = configure_session(builder, shuffle_partitions=8).getOrCreate()
    yield session
    session.stop()

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from trajlib_spark.session import get_spark

    s = get_spark(app_name="trajlib-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def points(spark):
    from trajlib_spark.config import PORTO_GRID
    from trajlib_spark.operators import cells
    from trajlib_spark.sources import synth

    return cells.with_cell(synth.synthetic_points(spark, SF), PORTO_GRID).cache()


@pytest.fixture(scope="session")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="session")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()

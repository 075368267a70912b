from __future__ import annotations

import pytest

from anomaly_detection_spark.session import get_spark
from anomaly_detection_spark.datagen import generate_documents, generate_media_catalog


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def docs(spark):
    return generate_documents(spark, n_docs=2000, n_partitions=8, n_media=500).cache()


@pytest.fixture(scope="session")
def catalog(spark):
    return generate_media_catalog(spark, n_media=500).cache()


@pytest.fixture(scope="session")
def docs_pd(docs):
    """Collected pandas copy — the tiny, obviously-correct oracle substrate
    (SURVEY.md §5: pandas reimplementation of each rule on the same data)."""
    return docs.toPandas()

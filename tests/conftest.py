import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .appName("jsonschema-infer-spark-tests")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tx_paths(tmp_path_factory):
    """Tiny transcript fixtures (clean + violated + injection log)."""
    from jsonschema_infer_spark.sources.transcripts import (
        generate_transcripts,
        inject_violations,
        write_parquet,
    )

    d = tmp_path_factory.mktemp("tx")
    clean = generate_transcripts(2000, seed=42)
    viol, log = inject_violations(clean, seed=42)
    p_clean = str(d / "clean.parquet")
    p_viol = str(d / "viol.parquet")
    write_parquet(clean, p_clean)
    write_parquet(viol, p_viol)
    return {"clean": p_clean, "viol": p_viol, "log": log}


SF_DIR = "/root/testdata/sf0.001"

import numpy as np
import pandas as pd
import pytest

from xarray_scipy_spark.session import get_spark

# reference fixture re-derived (tests/test_signal.py:41-62): pure sine,
# amplitude 2, f/fs chosen small so the suite stays fast
FS = 400.0
F0 = 20.0
AMP = 2.0
NSAMP = 400
NCHAN = 4


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("xarray_scipy_spark-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sine_pdf():
    t = np.arange(NSAMP) / FS
    rows = []
    for ch in range(NCHAN):
        rows.append(
            pd.DataFrame(
                {
                    "channel": ch,
                    "time": t,
                    "value": AMP * np.sin(2 * np.pi * F0 * t),
                }
            )
        )
    return pd.concat(rows, ignore_index=True)


@pytest.fixture(scope="session")
def sine_df(spark, sine_pdf):
    return spark.createDataFrame(sine_pdf).repartition(5).cache()

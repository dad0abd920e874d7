"""Pipeline unit tests (the contract's DuckDB oracles are the deep
checks; these pin the local semantics without a Spark↔DuckDB pair)."""

import hashlib

import pandas as pd

import xarray_scipy_spark.pipeline as pl


def _docs_df(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "abcdefgh12345678XXXXXXXXtail",  # 3 full frames + tail
                    "short",  # < 1 frame
                    "abcdefgh" * 6,  # 6 full frames
                ],
            }
        )
    )


def test_frame_sample_stride_and_features(spark):
    df = pl.with_binary(_docs_df(spark))
    out = pl.frame_sample(df, frame_bytes=8, every=3).toPandas()
    per = out.groupby("doc_id")["frame_idx"].apply(list).to_dict()
    # doc 0: frames 0,1,2 -> sampled [0]; doc 1: none; doc 2: 6 -> [0, 3]
    assert per.get(0) == [0]
    assert 1 not in per
    assert sorted(per.get(2)) == [0, 3]
    row = out[(out.doc_id == 0) & (out.frame_idx == 0)].iloc[0]
    assert row["f0"] == float(hashlib.md5(b"abcdefgh").digest()[0])


def test_resize_payload_truncate_and_pad(spark):
    df = pl.with_binary(_docs_df(spark))
    out = pl.resize_payload(df, target_bytes=16).toPandas().set_index("doc_id")
    assert (out["n_bytes"] == 16).all()
    assert bytes(out.loc[1, "payload"]) == b"short" + b"." * 11
    assert bytes(out.loc[2, "payload"]) == b"abcdefgh" * 2
    assert out.loc[1, "digest"] == hashlib.md5(b"short" + b"." * 11).hexdigest()

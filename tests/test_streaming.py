"""Streaming stateful filter: chunked sosfilt must equal batch sosfilt.

The stream is fed from a directory of parquet files, one time-slice per
file, processed one file per micro-batch (``maxFilesPerTrigger=1`` +
``Trigger.AvailableNow``) so the per-key ``zi`` handoff across batches
is actually exercised — a single-batch run would hide broken state
carry."""

import time

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xarray_scipy_spark.kernels.dsp import sosfilt_1d
from xarray_scipy_spark.kernels.filter_design import butter_sos
from xarray_scipy_spark.streaming import sosfilt_stream

N = 96
NCHUNKS = 3
NCH = 2


@pytest.fixture(scope="module")
def chunked_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_src")
    rng = np.random.default_rng(3)
    full = {}
    t = np.arange(N, dtype=float)
    for ch in range(NCH):
        full[ch] = np.sin(2 * np.pi * 5 * t / N) + 0.2 * rng.standard_normal(N)
    per = N // NCHUNKS
    for i in range(NCHUNKS):
        rows = []
        for ch in range(NCH):
            sl = slice(i * per, (i + 1) * per)
            rows.append(
                pd.DataFrame(
                    {"ch": ch, "t": t[sl], "value": full[ch][sl]}
                )
            )
        pd.concat(rows, ignore_index=True).to_parquet(root / f"chunk_{i}.parquet")
        time.sleep(1.1)  # distinct mtimes fix the file processing order
    return str(root), full


def test_sosfilt_stream_matches_batch(spark, chunked_dir, tmp_path):
    src, full = chunked_dir
    sos = butter_sos(4, 0.2)
    schema = "ch bigint, t double, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = sosfilt_stream(stream, sos, by=["ch"], dim="t")
    q = (
        out.writeStream.format("memory")
        .queryName("sos_stream_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from sos_stream_out").collect()
    # at least two micro-batches must have run for the state carry to
    # be exercised; AvailableNow + maxFilesPerTrigger=1 guarantees one
    # batch per file
    progress = q.recentProgress
    assert len(progress) >= NCHUNKS
    got = {}
    for r in rows:
        got.setdefault(r["ch"], []).append((r["idx"], r["t"], r["value"]))
    for ch in range(NCH):
        chunk = sorted(got[ch])
        assert [c[0] for c in chunk] == list(range(N))  # contiguous idx
        y_stream = np.array([c[2] for c in chunk])
        y_batch = sosfilt_1d(sos, full[ch])
        np.testing.assert_allclose(y_stream, y_batch, atol=1e-12)


def test_windowed_stats_stream_equals_batch(spark, tmp_path):
    """Tumbling-window stats over a multi-batch stream must equal the
    same plan run on the static union of the input."""
    import uuid

    from xarray_scipy_spark.streaming import windowed_stats

    rng = np.random.default_rng(7)
    src = tmp_path / "win_src"
    src.mkdir()
    frames = []
    for i in range(NCHUNKS):
        # event times in nanos spanning several 60 s windows per batch
        ts = (i * 400 + rng.integers(0, 400, size=50)) * 1_000_000_000
        pdf = pd.DataFrame(
            {
                "ch": rng.integers(0, NCH, size=50),
                "ts": np.sort(ts).astype("int64"),
                "value": rng.standard_normal(50),
            }
        )
        frames.append(pdf)
        pdf.to_parquet(src / f"chunk_{i}.parquet")
        time.sleep(1.1)
    allpdf = pd.concat(frames, ignore_index=True)

    schema = "ch bigint, ts bigint, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = windowed_stats(
        stream, by=["ch"], dim="ts", window="60 seconds", watermark="10 minutes"
    )
    name = f"win_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table(name).toPandas().sort_values(["ch", "window_start"])

    batch = windowed_stats(
        spark.createDataFrame(allpdf, schema=schema),
        by=["ch"],
        dim="ts",
        window="60 seconds",
    )
    want = batch.toPandas().sort_values(["ch", "window_start"])
    assert len(got) == len(want)
    np.testing.assert_array_equal(
        got["n"].to_numpy(), want["n"].to_numpy()
    )
    for c in ("sum", "avg", "min", "max"):
        np.testing.assert_allclose(
            got[c].to_numpy(dtype=float), want[c].to_numpy(dtype=float), atol=1e-9
        )
    # window starts are whole minutes aligned to the epoch
    assert (got["window_start"].to_numpy() % 60 == 0).all()


def test_windowed_stats_steady_state_eviction_and_late_drop(spark, tmp_path):
    """Steady-state evidence for the streaming window agg (append mode,
    3 micro-batches): the watermark must actually EVICT closed windows
    from the state store (stateOperators.numRowsRemoved > 0, state size
    bounded below the total window count), DROP a too-late row (behind
    the watermark; the emitted window must NOT count it), and ACCEPT a
    late-but-inside-watermark row (its window must count it)."""
    import uuid

    from xarray_scipy_spark.streaming import windowed_stats

    SEC = 1_000_000_000
    src = tmp_path / "steady_src"
    src.mkdir()
    # window=60s, watermark=60s. Batch timeline (event-time seconds):
    #   b0: 10, 30, 100, 950, 990  -> wm for b1 = 990-60 = 930
    #   b1: 1500, 1510, late 910 (win [900,960) still in state: ACCEPTED)
    #       -> end of b1 evicts+emits windows ending <= 930 ([0,60),[60,120))
    #   b2: 2000, 2010, late 30 -> [0,60) was evicted in b1, so this row
    #       is DROPPED (numRowsDroppedByWatermark) — Spark's actual drop
    #       boundary is eviction, not the wm alone: a late row whose
    #       window state is still live merges into it instead
    #   final [1980,2040) window stays open (never emitted in append)
    batch_ts = [
        [10, 30, 100, 950, 990],
        [1500, 1510, 910],
        [2000, 2010, 30],
    ]
    for i, tss in enumerate(batch_ts):
        pd.DataFrame(
            {
                "ch": [0] * len(tss),
                "ts": [t * SEC for t in tss],
                "value": [float(t) for t in tss],
            }
        ).to_parquet(src / f"chunk_{i}.parquet")
        time.sleep(1.1)

    schema = "ch bigint, ts bigint, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = windowed_stats(
        stream, by=["ch"], dim="ts", window="60 seconds", watermark="60 seconds"
    )
    name = f"steady_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "steady_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(progress) >= 3  # one micro-batch per file, state carried

    # state-store eviction actually fired: rows were removed when the
    # watermark closed their windows, and the final state holds only
    # the still-open windows (far fewer than the 6 distinct windows seen)
    removed = sum(
        s.get("numRowsRemoved", 0) for p in progress for s in p["stateOperators"]
    )
    assert removed > 0
    final_state = sum(s["numRowsTotal"] for s in q.lastProgress["stateOperators"])
    assert final_state < 6
    # the too-late row (evicted window) was dropped and metered
    dropped = sum(
        s.get("numRowsDroppedByWatermark", 0)
        for p in progress
        for s in p["stateOperators"]
    )
    assert dropped >= 1

    got = spark.table(name).toPandas().sort_values("window_start", ignore_index=True)
    # append emits exactly the watermark-closed windows, once each
    assert got["window_start"].tolist() == [0, 60, 900, 960, 1500]
    by_start = got.set_index("window_start")
    # [0,60): the b2 late duplicate of t=30 was dropped -> NOT counted,
    # and crucially the window was not re-emitted after its eviction
    assert by_start.loc[0, "n"] == 2 and by_start.loc[0, "sum"] == 40.0
    # [900,960): late-but-state-still-live row t=910 IS counted
    assert by_start.loc[900, "n"] == 2 and by_start.loc[900, "sum"] == 950.0 + 910.0
    assert by_start.loc[960, "n"] == 1 and by_start.loc[960, "sum"] == 990.0
    # [1500,1560) closed by batch 2's watermark advance
    assert by_start.loc[1500, "n"] == 2
    # the final [1980,2040) window is still open -> withheld by append


def test_session_stats_stream_subset_of_batch(spark, tmp_path):
    """Native session windows on a multi-batch stream (update mode is
    unsupported for memory+session; append emits only watermark-closed
    sessions): every emitted session must match the batch run of the
    same plan exactly, and sessions clearly older than the final
    watermark must all have been emitted."""
    import uuid

    from xarray_scipy_spark.streaming import session_stats

    rng = np.random.default_rng(13)
    src = tmp_path / "sess_src"
    src.mkdir()
    frames = []
    for i in range(NCHUNKS):
        # bursts ~100 s apart with 1 hour between batches: gap=10 minutes
        # splits sessions inside AND across micro-batches
        base = i * 3600
        ts = (base + np.sort(rng.integers(0, 300, size=40))) * 1_000_000_000
        pdf = pd.DataFrame(
            {
                "ch": rng.integers(0, NCH, size=40),
                "ts": ts.astype("int64"),
                "value": rng.standard_normal(40),
            }
        )
        frames.append(pdf)
        pdf.to_parquet(src / f"chunk_{i}.parquet")
        time.sleep(1.1)
    allpdf = pd.concat(frames, ignore_index=True)

    schema = "ch bigint, ts bigint, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = session_stats(
        stream, by=["ch"], dim="ts", gap="10 minutes", watermark="30 minutes"
    )
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table(name).toPandas()

    want = session_stats(
        spark.createDataFrame(allpdf, schema=schema),
        by=["ch"],
        dim="ts",
        gap="10 minutes",
    ).toPandas()

    wkey = want.set_index(["ch", "session_start"])
    assert len(got) > 0
    for _, r in got.iterrows():
        w = wkey.loc[(r["ch"], r["session_start"])]
        assert w["session_end"] == r["session_end"]
        assert w["n"] == r["n"]
        np.testing.assert_allclose(w["sum"], r["sum"], atol=1e-9)
    # the final watermark trails max event time by 30 min; every session
    # closed >30 min (plus slack) before the end must have been emitted
    max_us = int(allpdf["ts"].max()) // 1000
    horizon = max_us - 45 * 60 * 1_000_000
    must_emit = want[want["session_end"] < horizon]
    got_keys = set(zip(got["ch"], got["session_start"]))
    for _, r in must_emit.iterrows():
        assert (r["ch"], r["session_start"]) in got_keys


def test_stream_distinct_exact_and_watermarked(spark, tmp_path):
    """stream_distinct in both state regimes across 3 micro-batches:

    - exact mode (no watermark): every distinct key emitted exactly
      once regardless of how far apart duplicates arrive — equals batch
      SELECT DISTINCT over the concatenated input.
    - watermarked mode: a duplicate arriving within the event-time
      horizon is dropped; a re-arrival far beyond it (state evicted) is
      emitted again — the documented recall/state trade.
    """
    import uuid

    from xarray_scipy_spark.streaming import stream_distinct

    SEC = 1_000_000_000
    src = tmp_path / "dedup_src"
    src.mkdir()
    # key k1 repeats within 30s (inside the 60s watermark horizon);
    # key k2 re-appears 10_000s later (far beyond it). Two timing
    # subtleties of the state machinery, pinned deliberately: the
    # watermark only advances at batch END (so b2 pushes it past k2's
    # expiry = 20s + 60s delay), and expired state is removed at the
    # END of the batch that first runs under that watermark, AFTER its
    # own rows were deduped (so b3 performs the eviction and the
    # re-arrival must land in b4 to see the evicted state).
    batches = [
        [("k1", 10), ("k2", 20)],
        [("k1", 40), ("k3", 100)],
        [("k4", 5_000)],
        [("k5", 5_010)],
        [("k2", 10_100)],
    ]
    for i, rows in enumerate(batches):
        pd.DataFrame(
            {
                "key": [k for k, _ in rows],
                "ts": [t * SEC for _, t in rows],
            }
        ).to_parquet(src / f"b{i}.parquet")
        time.sleep(1.1)

    def run(watermark):
        name = f"sd_{uuid.uuid4().hex[:8]}"
        stream = (
            spark.readStream.schema("key string, ts bigint")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        out = stream_distinct(
            stream,
            cols=["key"],
            dim="ts" if watermark else None,
            watermark=watermark,
        )
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return [r["key"] for r in spark.table(name).collect()]

    exact = run(None)
    assert sorted(exact) == ["k1", "k2", "k3", "k4", "k5"]  # each once

    wm = run("60 seconds")
    # k1's 40s re-arrival is within the horizon -> dropped; k2 at
    # 10_100s is beyond it -> state evicted, emitted AGAIN
    assert sorted(wm) == ["k1", "k2", "k2", "k3", "k4", "k5"]


def test_decode_features_on_stream_equals_batch(spark, tmp_path):
    """The multimodal decode plumbing composes with Structured
    Streaming unchanged: mapInPandas is stateless, so readStream ->
    synth payload -> decode_features over micro-batches must produce
    exactly the batch result (the 100 TB ingest shape: decode as the
    corpus streams in, no separate batch pass)."""
    import uuid

    import numpy as np
    import pytest

    pa = pytest.importorskip("pyarrow")
    import pyarrow.parquet as pq

    import xarray_scipy_spark.pipeline as pl

    src = tmp_path / "ids"
    src.mkdir()
    for i in range(2):  # two files -> two micro-batches
        pq.write_table(
            pa.table({"doc_id": list(range(i * 4, i * 4 + 4))}),
            src / f"part{i}.parquet",
        )
        time.sleep(1.1)

    def synth(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 2 + d % 3, 2
                header = f"P6\n{w} {h}\n255\n".encode()
                data = bytes((d * 31 + i * 7) % 256 for i in range(3 * w * h))
                payloads.append(header + data)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def pipeline_of(df):
        payloads = df.mapInPandas(synth, "doc_id bigint, payload binary")
        return pl.decode_features(
            payloads, n_features=5, decoder=pl.image_decoder
        )

    stream = (
        spark.readStream.schema("doc_id bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    name = f"mm_stream_{uuid.uuid4().hex[:8]}"
    q = (
        pipeline_of(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "mm_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["n_bytes"], r["f0"], r["f3"], r["f4"])
        for r in spark.table(name).collect()
    }
    batch = {
        r["doc_id"]: (r["n_bytes"], r["f0"], r["f3"], r["f4"])
        for r in pipeline_of(spark.read.parquet(str(src))).collect()
    }
    assert got == batch and len(got) == 8


def test_stft_stream_matches_batch(spark, chunked_dir, tmp_path):
    """Streaming STFT with partial-frame carry must emit exactly the
    frames the batch transform produces, once each, across batch
    boundaries."""
    from xarray_scipy_spark.operators.spectral import window_taps
    from xarray_scipy_spark.streaming import stft_stream

    src, full = chunked_dir
    frame_len, hop = 32, 16
    schema = "ch bigint, t double, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stft_stream(stream, by=["ch"], dim="t", frame_len=frame_len, hop=hop)
    q = (
        out.writeStream.format("memory")
        .queryName("stft_stream_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_stft"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(q.recentProgress) >= NCHUNKS
    rows = spark.sql("select * from stft_stream_out").collect()
    taps = window_taps("hann", frame_len)
    for ch in range(NCH):
        x = full[ch]
        fr = (
            np.lib.stride_tricks.sliding_window_view(x, frame_len)[::hop]
            * taps
        )
        want = np.fft.rfft(fr, axis=-1)
        got = sorted(
            ((r["frame"], r["bin"], r["re"], r["im"]) for r in rows if r["ch"] == ch)
        )
        n_bins = frame_len // 2 + 1
        assert len(got) == want.shape[0] * n_bins  # every frame exactly once
        for f, b, re, im in got:
            assert abs(re - want[f, b].real) < 1e-9
            assert abs(im - want[f, b].imag) < 1e-9


def test_gapfill_stream_matches_batch(spark, tmp_path):
    """Irregular observations fed in 3 micro-batches: the streamed
    grid must equal batch gapfill row-for-row, values BIT-equal
    (same interpolation op order), for both methods."""
    from xarray_scipy_spark.operators import gapfill
    from xarray_scipy_spark.streaming import gapfill_stream

    rng = np.random.default_rng(11)
    rows = []
    for ch in range(2):
        # irregular instants over [0, 300): sorted unique ints
        ts = np.sort(rng.choice(np.arange(300), size=40, replace=False))
        for t in ts:
            rows.append((ch, float(t), float(np.sin(t / 7.0) + ch)))
    pdf = pd.DataFrame(rows, columns=["ch", "t", "value"])
    src = tmp_path / "gap_src"
    src.mkdir()
    # 3 time-sliced files -> 3 micro-batches (state carries across)
    for i, hi in enumerate((100.0, 200.0, 300.0)):
        lo = hi - 100.0
        part = pdf[(pdf.t >= lo) & (pdf.t < hi)]
        part.to_parquet(src / f"slice_{i}.parquet")
        time.sleep(1.1)

    batch_df = spark.createDataFrame(pdf)
    for method in ("linear", "ffill"):
        stream = (
            spark.readStream.schema("ch bigint, t double, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out = gapfill_stream(stream, by=["ch"], dim="t", dt=7, method=method)
        name = f"gapfill_stream_{method}"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{method}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert len(q.recentProgress) >= 3
        got = {
            (r["ch"], r["t"]): r["value"]
            for r in spark.sql(f"select * from {name}").collect()
        }
        expect = {
            (r["ch"], float(r["t"])): r["value"]
            for r in gapfill(
                batch_df, by=["ch"], dim="t", dt=7.0, method=method
            ).collect()
        }
        assert set(got) == set(expect)
        for kk in expect:
            assert got[kk] == expect[kk], (method, kk)  # bit-equal


def test_gapfill_stream_validates(spark, tmp_path):
    from xarray_scipy_spark.streaming import gapfill_stream

    stream = spark.readStream.schema("ch bigint, t double, value double").parquet(
        str(tmp_path)
    )
    with pytest.raises(ValueError, match="method"):
        gapfill_stream(stream, by=["ch"], dim="t", dt=1, method="cubic")
    with pytest.raises(ValueError, match="dt"):
        gapfill_stream(stream, by=["ch"], dim="t", dt=0)


def test_hll_stream_registers_equal_batch(spark, tmp_path):
    """Distinct-count sketching as a native streaming aggregation:
    after 3 micro-batches the register table must equal the batch
    hll_state registers row-for-row, and the folded estimate must be
    the batch estimate."""
    import xarray_scipy_spark.pipeline as pl
    from xarray_scipy_spark.streaming import hll_stream

    src = tmp_path / "hll_src"
    src.mkdir()
    all_rows = []
    for i in range(3):
        rows = pd.DataFrame(
            {
                "g": ["a" if k % 2 == 0 else "b" for k in range(400)],
                "v": [f"user-{i * 350 + k}" for k in range(400)],  # overlap
            }
        )
        all_rows.append(rows)
        rows.to_parquet(src / f"b{i}.parquet")
        time.sleep(1.1)
    stream = (
        spark.readStream.schema("g string, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = hll_stream(stream, "v", by=["g"], p=8)
    q = (
        out.writeStream.format("memory")
        .queryName("hll_stream_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "hll_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(q.recentProgress) >= 3
    got = {
        (r["g"], r["bucket"]): r["mj"]
        for r in spark.sql("select * from hll_stream_out").collect()
    }
    batch_df = spark.createDataFrame(pd.concat(all_rows, ignore_index=True))
    # batch registers from the same expressions
    from xarray_scipy_spark.streaming import hll_stream as hs

    expect = {
        (r["g"], r["bucket"]): r["mj"] for r in hs(batch_df, "v", by=["g"], p=8).collect()
    }
    assert got == expect
    # folded estimate equals the batch hll_state estimate per group
    for g in ("a", "b"):
        regs = [(b, mj) for (gg, b), mj in got.items() if gg == g]
        m = 256
        zeros = m - len(regs)
        rsum = sum(1 << (49 - mj) for _, mj in regs) + zeros * (1 << 49)
        est = pl.hll_estimate(m, zeros, rsum)
        batch = {
            r["g"]: r.asDict()
            for r in pl.hll_state(batch_df, "v", by="g", p=8).collect()
        }[g]
        assert est == pl.hll_estimate(
            batch["m"], batch["zeros"], batch["register_sum"]
        )
        exact = batch_df.filter(F.col("g") == g).select("v").distinct().count()
        assert abs(est - exact) / exact < 0.2  # p=8 -> sigma ~6.5%


def test_countmin_stream_cells_equal_batch(spark, tmp_path):
    """Frequency sketching as a native streaming SUM: after 3
    micro-batches the cell table equals the batch countmin_sketch."""
    import xarray_scipy_spark.pipeline as pl
    from xarray_scipy_spark.streaming import countmin_stream

    src = tmp_path / "cm_src"
    src.mkdir()
    frames = []
    for i in range(3):
        rows = pd.DataFrame({"tok": [f"k{(i * 7 + k) % 40}" for k in range(300)]})
        frames.append(rows)
        rows.to_parquet(src / f"b{i}.parquet")
        time.sleep(1.1)
    stream = (
        spark.readStream.schema("tok string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = countmin_stream(stream, "tok", depth=2, width=64)
    q = (
        out.writeStream.format("memory")
        .queryName("cm_stream_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "cm_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(q.recentProgress) >= 3
    got = sorted(
        map(tuple, spark.sql("select * from cm_stream_out").collect())
    )
    batch = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    expect = sorted(
        map(tuple, pl.countmin_sketch(batch, "tok", depth=2, width=64).collect())
    )
    assert got == expect


def test_stream_interval_join_equals_batch(spark, tmp_path):
    """Stream-stream bounded-lookback enrichment across 3 micro-batch
    pairs equals the batch interval join row-for-row (inner), and the
    join carries watermarks on BOTH sides (the state-bound
    prerequisite)."""
    from xarray_scipy_spark.streaming import stream_interval_join

    lsrc = tmp_path / "ij_left"
    rsrc = tmp_path / "ij_right"
    lsrc.mkdir(); rsrc.mkdir()
    base = pd.Timestamp("2024-01-01")
    lrows, rrows = [], []
    for i in range(30):
        lrows.append((i % 3, base + pd.Timedelta(seconds=20 * i), float(i)))
    for j in range(10):
        rrows.append((j % 3, base + pd.Timedelta(seconds=55 * j), f"ctx{j}"))
    lpdf = pd.DataFrame(lrows, columns=["k", "lts", "v"])
    rpdf = pd.DataFrame(rrows, columns=["k", "rts", "ctx"])
    # parquet micros, not pandas' ns default (the declared read schema
    # is Spark's microsecond timestamp)
    lpdf["lts"] = lpdf["lts"].astype("datetime64[us]")
    rpdf["rts"] = rpdf["rts"].astype("datetime64[us]")
    for i in range(3):
        lpdf.iloc[i * 10 : (i + 1) * 10].to_parquet(lsrc / f"l{i}.parquet")
        rpdf.iloc[i * 4 : (i + 1) * 4].to_parquet(rsrc / f"r{i}.parquet")
        time.sleep(1.1)
    ls = (
        spark.readStream.schema("k long, lts timestamp, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(lsrc))
    )
    rs = (
        spark.readStream.schema("k long, rts timestamp, ctx string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(rsrc))
    )
    out = stream_interval_join(
        ls, rs, on=["k"], left_ts="lts", right_ts="rts", tolerance="90 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ij_out")
        .option("checkpointLocation", str(tmp_path / "ij_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["k"], r["v"], r["ctx"])
        for r in spark.sql("select * from ij_out").collect()
    }
    lb = spark.createDataFrame(lpdf)
    rb = spark.createDataFrame(rpdf)
    expect = {
        (r["k"], r["v"], r["ctx"])
        for r in lb.alias("l")
        .join(
            rb.alias("r"),
            (F.col("l.k") == F.col("r.k"))
            & (F.col("r.rts") <= F.col("l.lts"))
            & (F.col("r.rts") >= F.col("l.lts") - F.expr("INTERVAL 90 seconds")),
        )
        .select(F.col("l.k"), F.col("l.v"), F.col("r.ctx"))
        .collect()
    }
    assert got == expect and len(got) > 0
    with pytest.raises(ValueError, match="how"):
        stream_interval_join(
            ls, rs, on=["k"], left_ts="lts", right_ts="rts", how="full"
        )


def test_ohlc_stream_equals_batch_and_batch_operator(spark, tmp_path):
    """Streaming OHLC bars over a multi-batch stream must equal (a) the
    same streaming plan on the static union and (b) the batch
    ohlc_bars operator's OHLC/mean columns on identical rows — the
    min_by/max_by state-store merge must pick the same open/close."""
    import uuid

    from xarray_scipy_spark.operators import ohlc_bars
    from xarray_scipy_spark.streaming import ohlc_stream

    rng = np.random.default_rng(13)
    src = tmp_path / "ohlc_src"
    src.mkdir()
    frames = []
    for i in range(NCHUNKS):
        ts = (i * 400 + rng.integers(0, 400, size=50)) * 1_000_000_000
        pdf = pd.DataFrame(
            {
                "ch": rng.integers(0, NCH, size=50),
                "ts": np.sort(ts).astype("int64"),
                "value": rng.standard_normal(50).round(4),
            }
        )
        # unique (ch, ts) within and across chunks: min_by/max_by need a
        # well-defined winner (real event streams have unique instants
        # per key; the testdata does too)
        pdf = pdf.drop_duplicates(["ch", "ts"])
        frames.append(pdf)
        pdf.to_parquet(src / f"chunk_{i}.parquet")
        time.sleep(1.1)
    allpdf = pd.concat(frames, ignore_index=True).drop_duplicates(["ch", "ts"])

    schema = "ch bigint, ts bigint, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = ohlc_stream(stream, by=["ch"], dim="ts", bar="60 seconds")
    name = f"ohlc_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_ohlc"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table(name).toPandas().sort_values(["ch", "bar_start"])

    sdf = spark.createDataFrame(allpdf, schema=schema)
    want = (
        ohlc_stream(sdf, by=["ch"], dim="ts", bar="60 seconds")
        .toPandas()
        .sort_values(["ch", "bar_start"])
    )
    assert len(got) == len(want)
    for c in ("n", "open", "high", "low", "close"):
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy())
    np.testing.assert_allclose(
        got["mean"].to_numpy(float), want["mean"].to_numpy(float), atol=1e-9
    )

    # batch-operator parity: ts here is epoch NANOS (bigint), the batch
    # operator buckets in epoch seconds — same 60 s bars
    batch = (
        ohlc_bars(
            sdf.select(
                "ch", (F.col("ts") / F.lit(1_000_000_000)).alias("t"), "value"
            ),
            by=["ch"],
            dim="t",
            value="value",
            bar=60.0,
            twap=False,
        )
        .toPandas()
        .sort_values(["ch", "bar_start"])
    )
    assert len(batch) == len(got)
    for c in ("n", "open", "high", "low", "close"):
        np.testing.assert_array_equal(got[c].to_numpy(), batch[c].to_numpy())


def test_latest_stream_equals_batch_operator(spark, tmp_path):
    """Streaming latest-per-key over a multi-batch stream must equal
    the batch latest_by_key compaction on the same rows."""
    import uuid

    from xarray_scipy_spark.pipeline import latest_by_key
    from xarray_scipy_spark.streaming import latest_stream

    rng = np.random.default_rng(29)
    src = tmp_path / "latest_src"
    src.mkdir()
    frames = []
    for i in range(NCHUNKS):
        ts = (i * 400 + rng.integers(0, 400, size=50)) * 1_000_000_000
        pdf = pd.DataFrame(
            {
                "ch": rng.integers(0, NCH, size=50),
                "ts": np.sort(ts).astype("int64"),
                "value": rng.standard_normal(50).round(4),
            }
        ).drop_duplicates(["ch", "ts"])
        frames.append(pdf)
        pdf.to_parquet(src / f"chunk_{i}.parquet")
        time.sleep(1.1)
    allpdf = pd.concat(frames, ignore_index=True).drop_duplicates(["ch", "ts"])

    schema = "ch bigint, ts bigint, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = latest_stream(stream, keys=["ch"], dim="ts", values=["value"])
    name = f"latest_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_latest"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table(name).toPandas().sort_values("ch").reset_index(drop=True)

    sdf = spark.createDataFrame(allpdf, schema=schema)
    want = (
        latest_by_key(sdf, keys="ch", order_col="ts")
        .select("ch", "ts", "value")
        .toPandas()
        .sort_values("ch")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["ch", "ts", "value"]], want)


def test_windowed_constraints_stream_equals_batch(spark, tmp_path):
    """The windowed data-quality monitor over a multi-batch stream must
    equal the same plan run on the static union of the input — the
    stream-equals-batch pin for pipeline/quality.windowed_constraints."""
    import uuid

    from xarray_scipy_spark.pipeline import windowed_constraints

    rng = np.random.default_rng(11)
    src = tmp_path / "wc_src"
    src.mkdir()
    frames = []
    for i in range(NCHUNKS):
        ts = (i * 400 + rng.integers(0, 400, size=50)) * 1_000_000_000
        pdf = pd.DataFrame(
            {
                "ts": np.sort(ts).astype("int64"),
                "kindc": rng.choice(["a", "b", "bad"], size=50),
                "value": rng.standard_normal(50),
            }
        )
        frames.append(pdf)
        pdf.to_parquet(src / f"chunk_{i}.parquet")
        time.sleep(1.1)
    allpdf = pd.concat(frames, ignore_index=True)

    cons = [
        {"kind": "not_null", "column": "value"},
        {"kind": "between", "column": "value", "min": -1, "max": 1},
        {"kind": "in_set", "column": "kindc", "values": ["a", "b"]},
        {"kind": "min_rows", "value": 10},
        {"kind": "non_negative", "column": "value"},
    ]
    schema = "ts bigint, kindc string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = windowed_constraints(
        stream, dim="ts", constraints=cons, window="60 seconds",
        watermark="10 minutes",
    )
    name = f"wc_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "wc_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.table(name).collect())
    )
    batch = windowed_constraints(
        spark.createDataFrame(allpdf), dim="ts", constraints=cons,
        window="60 seconds", watermark="10 minutes",
    )
    exp = sorted(map(tuple, batch.collect()))
    assert got == exp and len(got) > 0
    # sanity on content: the in_set violations per window sum to the
    # static count of 'bad' rows
    bad = int((allpdf["kindc"] == "bad").sum())
    got_bad = sum(r[4] for r in got if r[1] == "in_set(kindc)")
    assert got_bad == bad


def test_windowed_constraints_rejects_unique(spark):
    from xarray_scipy_spark.pipeline import windowed_constraints

    df = spark.createDataFrame([(1, 1.0)], "ts long, value double")
    with pytest.raises(ValueError, match="unique"):
        windowed_constraints(
            df, dim="ts",
            constraints=[{"kind": "unique", "columns": ["value"]}],
        )


def test_missing_windows_live_monitor_shrinks_per_trigger(spark, tmp_path):
    """The total-silence monitor in its LIVE configuration: each
    micro-batch, missing_windows runs on the windowed aggregate's
    complete snapshot with a PINNED horizon (the configuration that
    skips the bounds scan). Silent windows shrink monotonically as
    feeds report in, and the final report equals the batch call on the
    full data."""
    import xarray_scipy_spark.pipeline as pl

    src = tmp_path / "mw_src"
    src.mkdir()
    base = pd.Timestamp("2024-03-01")
    # horizon: 10 windows of 60 s; batches fill windows 0-1, 4-5, 8
    fills = [(0, 1), (4, 5), (8,)]
    all_rows = []
    for i, wins in enumerate(fills):
        rows = pd.DataFrame(
            {
                "ts": [
                    (base + pd.Timedelta(seconds=60 * w + 7)).to_datetime64()
                    for w in wins
                ],
                "value": [float(w) for w in wins],
            }
        )
        rows["ts"] = rows["ts"].astype("datetime64[us]")
        all_rows.append(rows)
        rows.to_parquet(src / f"b{i}.parquet")
        time.sleep(1.1)
    epoch0 = int(base.tz_localize("UTC").timestamp())
    lo, hi = epoch0, epoch0 + 600

    stream = (
        spark.readStream.schema("ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = stream.groupBy(F.window("ts", "60 seconds")).count().select(
        F.col("window.start").cast("long").alias("window_start"), "count"
    )
    per_trigger: list[list[int]] = []

    def monitor(batch_df, batch_id):
        gaps = pl.missing_windows(
            batch_df, window_seconds=60, range_start=lo, range_end=hi
        )
        per_trigger.append([r["window_start"] for r in gaps.collect()])

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(monitor)
        .option("checkpointLocation", str(tmp_path / "mw_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(per_trigger) >= 3
    # monotone shrink: every later report is a subset of every earlier
    for a, b in zip(per_trigger, per_trigger[1:]):
        assert set(b) <= set(a)
    # final report equals the batch call on the full data
    full = spark.createDataFrame(pd.concat(all_rows, ignore_index=True))
    batch_obs = full.groupBy(F.window("ts", "60 seconds")).count().select(
        F.col("window.start").cast("long").alias("window_start")
    )
    expect = [
        r["window_start"]
        for r in pl.missing_windows(
            batch_obs, window_seconds=60, range_start=lo, range_end=hi
        ).collect()
    ]
    assert per_trigger[-1] == expect
    # the pinned horizon reports the windows 2,3,6,7,9 as silent
    assert expect == [epoch0 + 60 * w for w in (2, 3, 6, 7, 9)]

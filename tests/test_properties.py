"""Property-based tests (hypothesis): operator invariants that must hold on
ANY input, not just the driver corpus. Examples are kept small and few —
each property runs a real Spark job per example."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from realtime_market_data_pipeline_spark.operators.features import compute_features
from realtime_market_data_pipeline_spark.operators.text import (
    chunk_documents,
    with_split_assignment,
)

_SETTINGS = dict(max_examples=8, deadline=None)

tick_lists = st.lists(
    st.tuples(
        st.sampled_from(["A", "B"]),
        st.floats(min_value=0.01, max_value=1e6, allow_nan=False),
        st.integers(min_value=0, max_value=10**8),
    ),
    min_size=1,
    max_size=30,
)


@given(ticks=tick_lists)
@settings(**_SETTINGS)
def test_features_invariants(spark, ticks):
    df = spark.createDataFrame(
        ticks, ["symbol", "price", "event_time_ms"]
    ).withColumn("event_time", F.timestamp_millis("event_time_ms"))
    out = compute_features(df, window="10 seconds").collect()
    assert sum(r.num_ticks for r in out) == len(ticks)  # every tick in exactly one window
    for r in out:
        assert r.window_start < r.window_end
        assert r.num_ticks >= 1
        # first/last are real prices from the input
        prices = {p for s, p, t in ticks if s == r.symbol}
        assert r.first_price in prices and r.last_price in prices
        if r.log_return is not None:
            assert r.volatility is not None and r.volatility >= 0


doc_lists = st.lists(
    st.text(
        alphabet=st.sampled_from("ab c"),  # forces multi-token texts with spaces
        min_size=1,
        max_size=60,
    ),
    min_size=1,
    max_size=10,
)


@given(texts=doc_lists, chunk=st.integers(2, 6))
@settings(**_SETTINGS)
def test_chunking_reconstructs_documents(spark, texts, chunk):
    """With stride == chunk_tokens (no overlap), re-concatenating a doc's
    chunks in order must reproduce its exact token sequence."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    chunks = chunk_documents(df, chunk_tokens=chunk, stride=chunk).collect()
    toks = {
        r.doc_id: r.toks
        for r in df.select("doc_id", F.split("text", r"\s+").alias("toks")).collect()
    }
    by_doc: dict = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text))
    for doc_id, parts in by_doc.items():
        parts.sort()
        rebuilt = " ".join(p for _, p in parts).split(" ")
        assert rebuilt == toks[doc_id]
        assert [i for i, _ in parts] == list(range(len(parts)))


@given(ids=st.lists(st.integers(0, 10**9), min_size=1, max_size=50, unique=True))
@settings(**_SETTINGS)
def test_split_assignment_is_stable_and_partition_free(spark, ids):
    """Split membership is a pure function of the id: identical across runs
    and across partitioning."""
    df1 = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    df2 = df1.repartition(7)
    a = {r.doc_id: r.split for r in with_split_assignment(df1).collect()}
    b = {r.doc_id: r.split for r in with_split_assignment(df2).collect()}
    assert a == b
    assert set(a.values()) <= {"train", "eval"}


@given(texts=doc_lists, ctx=st.integers(2, 9))
@settings(**_SETTINGS)
def test_packing_conserves_docs_and_tokens(spark, texts, ctx):
    """The pack manifest is a partition of the input: every doc lands in
    exactly one (group, seq) cell, token totals are conserved, and seq_ids
    follow the running offset (doc i's bin is floor(offset_i / ctx))."""
    from realtime_market_data_pipeline_spark.operators.text import pack_documents

    df = spark.createDataFrame(
        [(i, "g", t) for i, t in enumerate(texts)],
        ["doc_id", "source", "text"],
    )
    import re

    out = pack_documents(df, ctx_tokens=ctx).collect()
    n_tok = [len(re.split(r"\s+", t)) for t in texts]  # same semantics as F.split
    assert sum(r.n_docs for r in out) == len(texts)
    assert sum(r.n_tokens for r in out) == sum(n_tok)
    # recompute expected bins driver-side
    exp: dict = {}
    off = 0
    for n in n_tok:
        seq = off // ctx
        d, tk = exp.get(seq, (0, 0))
        exp[seq] = (d + 1, tk + n)
        off += n
    assert {r.seq_id: (r.n_docs, r.n_tokens) for r in out} == exp


@given(texts=doc_lists)
@settings(**_SETTINGS)
def test_lm_scores_bounds_and_counts(spark, texts):
    """Every doc with >=2 tokens gets exactly one row; n_bigrams equals
    token_count-1; the known ratio is a true ratio."""
    from realtime_market_data_pipeline_spark.operators.text import bigram_lm_scores

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    import re

    out = {r.doc_id: r for r in bigram_lm_scores(df).collect()}
    for i, t in enumerate(texts):
        n = len(re.split(r"\s+", t))
        if n < 2:
            assert i not in out
        else:
            assert out[i].n_bigrams == n - 1
            assert 0.0 <= out[i].known_bigram_ratio <= 1.0


vec_lists = st.lists(
    st.lists(
        st.floats(min_value=-2.0, max_value=2.0, allow_nan=False, width=32),
        min_size=4,
        max_size=4,
    ).filter(lambda v: sum(x * x for x in v) > 1e-6),
    min_size=2,
    max_size=12,
)


@given(vecs=vec_lists, n_tables=st.sampled_from([1, 2, 4]))
@settings(**_SETTINGS)
def test_lsh_bucket_dedup_invariants(spark, vecs, n_tables):
    # on ANY corpus: exactly one output row per input id; canonical_id is
    # always <= vec_id (dup of a LOWER id or self); is_dup iff canonical
    # differs; uniques are self-canonical. Holds for every table count.
    from realtime_market_data_pipeline_spark.operators import similarity as sim

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    planes = [
        [(0.7 * h - 1.1) * (j + 1) % 1.7 - 0.8 for j in range(4)]
        for h in range(8)
    ]
    out = sim.lsh_bucket_dedup(
        df, planes, threshold=0.999, n_tables=n_tables
    ).collect()
    assert len(out) == len(vecs)
    assert {r.vec_id for r in out} == set(range(len(vecs)))
    for r in out:
        assert r.canonical_id <= r.vec_id
        assert r.is_dup == (r.canonical_id != r.vec_id)


@given(ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=30, unique=True))
@settings(**_SETTINGS)
def test_stratified_bucket_is_pure_function_of_id(spark, ids):
    # the md5 bucket behind stratified_sample_events: stable in [0,256),
    # independent of row order and partitioning — the property that makes
    # the sample reproducible and oracle-replayable
    from realtime_market_data_pipeline_spark.operators.text import split_bucket

    df = spark.createDataFrame([(i,) for i in ids], "event_id long")
    one = {
        r.event_id: r.b
        for r in df.coalesce(1).select("event_id", split_bucket("event_id", "strat:v1").alias("b")).collect()
    }
    many = {
        r.event_id: r.b
        for r in df.repartition(7).select("event_id", split_bucket("event_id", "strat:v1").alias("b")).collect()
    }
    assert one == many
    assert all(0 <= b < 256 for b in one.values())


event_lists = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user
        st.sampled_from(["view", "click", "purchase", "error"]),
        st.integers(min_value=0, max_value=10**6),  # ts ms
    ),
    min_size=1,
    max_size=25,
)


@given(events=event_lists)
@settings(**_SETTINGS)
def test_funnel_matches_python_model(spark, events):
    """funnel_user_stages ≡ a direct python fold of the strict-order rule,
    on arbitrary event soups (noise types, duplicate timestamps, any user
    interleaving)."""
    from realtime_market_data_pipeline_spark.operators.behavior import (
        funnel,
        funnel_user_stages,
    )

    rows = [
        (eid, u, typ, t) for eid, (u, typ, t) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_ms long"
    ).withColumn("ts", F.timestamp_millis("ts_ms"))

    def model(user):
        ts_of = lambda typ, lo: min(
            (t for u, ty, t in events if u == user and ty == typ and t >= lo),
            default=None,
        )
        t1 = ts_of("view", -1)
        t2 = ts_of("click", t1) if t1 is not None else None
        t3 = ts_of("purchase", t2) if t2 is not None else None
        return t1, t2, t3

    # round, not int(): timestamp() is a float, and e.g. 130.593 s
    # * 1000 = 130592.999... — int() truncation shaved a millisecond
    # off the expected value (hypothesis found ts=130593; the operator
    # was right, this conversion was wrong)
    ms = lambda ts: None if ts is None else round(
        ts.replace(tzinfo=__import__("datetime").timezone.utc).timestamp() * 1000
    )
    got = {
        r.user_id: (ms(r.t_s1), ms(r.t_s2), ms(r.t_s3))
        for r in funnel_user_stages(df).collect()
    }
    users = {u for u, _, _ in events}
    assert got == {u: model(u) for u in users}
    # roll-up monotonicity
    r = funnel(df).collect()[0]
    assert r.n_stage1 >= r.n_stage2 >= r.n_stage3


@given(events=event_lists)
@settings(**_SETTINGS)
def test_event_transitions_mass_conservation(spark, events):
    """Per-user chains of length n contribute exactly n−1 transitions, and
    probabilities row-normalize to 1 over each from_type."""
    from collections import Counter

    from realtime_market_data_pipeline_spark.operators.behavior import (
        event_transitions,
    )

    rows = [(eid, u, typ, t) for eid, (u, typ, t) in enumerate(events)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_ms long"
    ).withColumn("ts", F.timestamp_millis("ts_ms"))
    out = event_transitions(df).collect()
    per_user = Counter(u for u, _, _ in events)
    assert sum(r.n for r in out) == sum(n - 1 for n in per_user.values())
    by_from = Counter()
    for r in out:
        by_from[r.from_type] += r.prob
    for total in by_from.values():
        assert abs(total - 1.0) < 1e-4  # 6-dp rounding per cell


price_series = st.lists(
    st.floats(min_value=0.5, max_value=1000.0, allow_nan=False),
    min_size=1,
    max_size=20,
)


@given(closes=price_series)
@settings(**_SETTINGS)
def test_ema_rsi_bounds(spark, closes):
    """EMAs stay inside the running [min, max] envelope of the series
    (convex-combination recursion); MACD equals the EMA difference; RSI is
    pinned to [0, 100]."""
    from datetime import datetime, timedelta

    from realtime_market_data_pipeline_spark.operators.quant import ema_macd, rsi

    bars = spark.createDataFrame(
        [
            ("A", datetime(2026, 1, 1) + timedelta(days=i), float(c), i + 1)
            for i, c in enumerate(closes)
        ],
        "symbol string, day_ts timestamp, close double, day_idx int",
    )
    out = sorted(ema_macd(bars).collect(), key=lambda r: r.day_ts)
    for i, r in enumerate(out):
        lo, hi = min(closes[: i + 1]), max(closes[: i + 1])
        assert lo - 1e-6 <= r.ema_fast <= hi + 1e-6
        assert lo - 1e-6 <= r.ema_slow <= hi + 1e-6
        assert abs(r.macd - (r.ema_fast - r.ema_slow)) <= 2e-6
    for r in rsi(bars).collect():
        assert 0.0 <= r.rsi <= 100.0


# --- r6: pure-Python properties (no Spark job per example, so these can
# afford many examples) -------------------------------------------------------

_CODEC_SETTINGS = dict(max_examples=120, deadline=None)


@given(
    doc_id=st.integers(0, 10**12),
    w=st.integers(1, 40),
    h=st.integers(1, 40),
)
@settings(**_CODEC_SETTINGS)
def test_bmp_codec_roundtrip_property(doc_id, w, h):
    """decode(make_bmp(id,w,h)) must recover the exact dimensions and the
    arithmetic pixel sum for ANY (id, w, h) — including widths where the
    row stride needs 0/1/2/3 pad bytes."""
    from realtime_market_data_pipeline_spark.operators import multimodal as mm

    d = mm.decode_image(mm.make_bmp(doc_id, w, h))
    assert (d["width"], d["height"], d["bpp"]) == (w, h, 24)
    assert d["pixel_sum"] == 3 * w * sum((doc_id + y) % 256 for y in range(h))


@given(
    doc_id=st.integers(0, 10**12),
    n=st.integers(1, 200),
    rate=st.integers(1000, 96000),
)
@settings(**_CODEC_SETTINGS)
def test_wav_codec_roundtrip_property(doc_id, n, rate):
    from realtime_market_data_pipeline_spark.operators import multimodal as mm

    d = mm.decode_audio(mm.make_wav(doc_id, n, rate))
    samples = [((doc_id * 31 + i * 17) % 65536) - 32768 for i in range(n)]
    assert d["sample_rate"] == rate and d["n_samples"] == n
    assert d["sample_sum"] == sum(samples)
    assert d["sample_peak"] == max(abs(s) for s in samples)


@given(
    stream=st.lists(st.integers(0, 12), min_size=1, max_size=300),
    k=st.integers(2, 6),
    cuts=st.lists(st.integers(0, 299), max_size=4),
)
@settings(**_CODEC_SETTINGS)
def test_space_saving_merge_math_property(stream, k, cuts):
    """The additive-error merge combine (the math heavy_hitters_merged
    runs as DataFrame aggregates) is sound and complete for ANY stream
    split into ANY partitioning: est−err ≤ true ≤ est per emitted id, and
    every id with true count > n/k is emitted."""
    from collections import Counter

    from realtime_market_data_pipeline_spark.operators.sketches import (
        make_space_saving_fold,
    )

    bounds = sorted({c for c in cuts if c < len(stream)} | {0, len(stream)})
    parts = [
        stream[a:b] for a, b in zip(bounds, bounds[1:]) if b > a
    ] or [stream]
    fold = make_space_saving_fold(k)
    sketches = []
    for part in parts:
        table: dict = {}
        n_i = fold(table, 0, part)
        m_i = min(c for c, _ in table.values()) if len(table) >= k else 0
        sketches.append((table, m_i, n_i))
    true = Counter(stream)
    m_total = sum(m for _, m, _ in sketches)
    n_total = sum(n for _, _, n in sketches)
    union = {u for t, _, _ in sketches for u in t}
    for u in union:
        est_track = sum(t[u][0] for t, _, _ in sketches if u in t)
        lb = sum(t[u][0] - t[u][1] for t, _, _ in sketches if u in t)
        m_track = sum(m for t, m, _ in sketches if u in t)
        ub = est_track + m_total - m_track
        assert lb <= true[u] <= ub, (u, lb, true[u], ub)
    for u, c in true.items():
        if c * k > n_total:
            assert u in union, f"heavy hitter {u} (count {c}) not emitted"


@given(
    doc_id=st.integers(0, 10**12),
    w=st.integers(1, 40),
    h=st.integers(1, 40),
)
@settings(**_CODEC_SETTINGS)
def test_png_codec_roundtrip_property(doc_id, w, h):
    """decode(make_png(id,w,h)) must recover the exact dimensions and the
    arithmetic pixel sum for ANY (id, w, h) — any h ≥ 5 cycles through all
    five scanline filters, and the per-(x,y)-varying pixels keep every
    filter's predictor non-trivial."""
    from realtime_market_data_pipeline_spark.operators import multimodal as mm

    d = mm.decode_image(mm.make_png(doc_id, w, h))
    assert (d["width"], d["height"], d["bpp"]) == (w, h, 24)
    assert d["pixel_sum"] == 3 * sum(
        (doc_id + x + 7 * y) % 256 for y in range(h) for x in range(w)
    )


def test_png_decoder_matches_spec_known_vector():
    """Pin the DECODER to the PNG spec independently of our encoder (a
    compensating encoder/decoder bug pair would survive the round-trip
    property): a hand-assembled 2x4 RGB PNG whose filtered scanlines were
    computed BY HAND per spec §9 (filters Sub/Up/Average/Paeth on rows
    0-3) must reconstruct the intended raw pixels — total 1963 — and a
    corrupted chunk CRC must be rejected."""
    import struct
    import zlib

    import pytest

    from realtime_market_data_pipeline_spark.operators import multimodal as mm

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    # raw rows: [10,20,30,40,50,60], [5,5,5,250,0,128],
    #           [100,110,120,130,140,150], [200,10,60,20,220,100]
    idat_raw = (
        bytes([1, 10, 20, 30, 30, 30, 30])
        + bytes([2, 251, 241, 231, 210, 206, 68])
        + bytes([3, 98, 108, 118, 211, 85, 26])
        + bytes([4, 100, 156, 196, 76, 210, 40])
    )
    png = (
        mm.PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 4, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(idat_raw))
        + chunk(b"IEND", b"")
    )
    d = mm.decode_png(png)
    assert (d["width"], d["height"], d["pixel_sum"]) == (2, 4, 1963)
    corrupted = bytearray(png)
    corrupted[-5] ^= 0xFF  # flip a bit in IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        mm.decode_png(bytes(corrupted))


@given(
    vals=st.lists(st.integers(0, 255), min_size=1, max_size=12),
    bxn=st.integers(1, 4),
)
@settings(**_CODEC_SETTINGS)
def test_jpeg_blockconstant_exact_property(vals, bxn):
    """ANY grid of 8x8-constant blocks round-trips BIT-EXACTLY through
    the baseline JPEG codec under a unit quant table — constant blocks
    are DC-only, so entropy-code -> decode -> IDCT loses nothing. This
    is the exactness contract the multimodal_decode_jpeg oracle rests
    on, for arbitrary block values (not just the doc_id arithmetic)."""
    import numpy as np

    from realtime_market_data_pipeline_spark.operators import jpeg

    byn = -(-len(vals) // bxn)
    padded = vals + [vals[-1]] * (bxn * byn - len(vals))
    img = np.zeros((byn * 8, bxn * 8), dtype=np.uint8)
    for i, v in enumerate(padded):
        by, bx = divmod(i, bxn)
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
    out = jpeg.decode_pixels(jpeg.encode_jpeg(img, quant=jpeg.UNIT_QT))
    assert np.array_equal(out, img)


@given(
    doc_id=st.integers(0, 10**12),
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    nf=st.integers(1, 10),
)
@settings(**_CODEC_SETTINGS)
def test_avi_codec_roundtrip_property(doc_id, w, h, nf):
    """decode_avi(make_avi(id,w,h,nf)) must recover dims, frame count,
    and every frame's arithmetic pixel sum for ANY (id, w, h, nf) —
    including widths needing 0/1/2/3 DIB row pad bytes."""
    from realtime_market_data_pipeline_spark.operators import multimodal as mm

    d = mm.decode_avi(mm.make_avi(doc_id, w, h, nf))
    assert (d["width"], d["height"], d["n_frames"]) == (w, h, nf)
    for f in range(nf):
        assert d["frame_sums"][f] == 3 * w * sum(
            (doc_id + 17 * f + y) % 256 for y in range(h)
        )


@given(
    seed=st.integers(0, 2**31 - 1),
    kind=st.integers(0, 9),
    n_flips=st.integers(1, 8),
)
@settings(max_examples=200, deadline=1000)
def test_decoders_fail_loudly_under_corruption(seed, kind, n_flips):
    """Untrusted-bytes contract for EVERY decoder: random byte corruption
    of a valid payload must either still decode (corruption landed in
    pixel/sample data — inherent to any codec) or raise ValueError /
    NotImplementedError — never hang (the 1 s deadline catches the
    2^31-phantom-rows class this test originally found: a corrupted BMP
    height spun for minutes) and never leak raw IndexError / KeyError /
    struct.error / zlib.error / wave.Error from parser internals.
    Kinds 6-7 (r8) fuzz the header-only prober over its two
    frame-walking formats (ogg pages, mp3 frames) — the walk strides by
    lengths read from corrupted bytes, the classic overrun shape."""
    import numpy as np

    from realtime_market_data_pipeline_spark.operators import jpeg
    from realtime_market_data_pipeline_spark.operators import multimodal as mm

    rng = np.random.default_rng(seed)
    did = int(rng.integers(0, 1000))
    if kind == 0:
        payload, dec = mm.make_jpeg(did), jpeg.decode_jpeg
    elif kind == 1:
        payload, dec = mm.make_png(did, 6, 6), mm.decode_png
    elif kind == 2:
        payload, dec = mm.make_avi(did, 3, 2, 2), mm.decode_avi
    elif kind == 3:
        payload, dec = mm.make_bmp(did, 5, 3), mm.decode_image
    elif kind == 4:
        payload, dec = mm.make_wav(did, 12, 8000), mm.decode_audio
    elif kind == 5:
        from realtime_market_data_pipeline_spark.operators import flac

        payload = flac.encode_flac(
            [[((did * 31 + i * 17) % 65536) - 32768 for i in range(20)]],
            block_size=8,
        )
        dec = mm.decode_audio
    elif kind == 6:
        payload, dec = mm.make_ogg(did, 3), mm.probe_media
    elif kind == 7:
        payload, dec = mm.make_mp3_frames(did, 2), mm.probe_media
    elif kind == 8:  # r8: MJPEG-in-AVI — corruption in container OR JPEG
        payload, dec = mm.make_avi_mjpeg(did, 8, 8, 2), mm.decode_avi
    else:  # r9: GIF — corruption in block framing OR the LZW stream
        payload, dec = mm.make_gif(did, 6, 5), mm.decode_gif
    buf = bytearray(payload)
    for _ in range(n_flips):
        buf[int(rng.integers(2, len(buf)))] ^= int(rng.integers(1, 256))
    try:
        dec(bytes(buf))
    except (ValueError, NotImplementedError):
        pass


@given(
    doc_id=st.integers(0, 10**12),
    sw=st.integers(1, 20),
    sh=st.integers(1, 20),
    tw=st.integers(1, 20),
    th=st.integers(1, 20),
)
@settings(**_CODEC_SETTINGS)
def test_resize_chain_property(doc_id, sw, sh, tw, th):
    """The full decode(PNG)->NN-resize->encode(BMP)->decode chain must
    equal the oracle's integer index arithmetic for ANY source/target
    dims (up, down, identity, degenerate 1-pixel axes)."""
    from realtime_market_data_pipeline_spark.operators import multimodal as mm

    out = mm.encode_bmp_pixels(
        mm.resize_nn(mm.decode_image_pixels(mm.make_png(doc_id, sw, sh)), tw, th)
    )
    d = mm.decode_image(out)
    expect = 3 * sum(
        (doc_id + (x * sw) // tw + 7 * ((y * sh) // th)) % 256
        for x in range(tw)
        for y in range(th)
    )
    assert (d["width"], d["height"], d["pixel_sum"]) == (tw, th, expect)


@given(
    seed=st.integers(0, 2**31 - 1),
    w=st.integers(1, 31),
    h=st.integers(1, 31),
    dri=st.integers(0, 3),
)
@settings(max_examples=60, deadline=None)
def test_jpeg_random_raster_bounded_and_restart_property(seed, w, h, dri):
    """ANY random grayscale raster (including non-multiple-of-8 dims and
    restart intervals) decodes within unit-quant rounding tolerance, and
    a restarted stream decodes identically to the unrestarted one. A
    zigzag, Huffman-table, stuffing, or resync bug lands far outside
    these bounds."""
    import numpy as np

    from realtime_market_data_pipeline_spark.operators import jpeg

    img = np.random.default_rng(seed).integers(
        0, 256, size=(h, w), dtype=np.uint8
    )
    plain = jpeg.decode_pixels(jpeg.encode_jpeg(img))
    assert plain.shape == (h, w)
    assert np.abs(plain.astype(int) - img.astype(int)).max() <= 4
    if dri:
        restarted = jpeg.decode_pixels(
            jpeg.encode_jpeg(img, restart_interval=dri)
        )
        assert np.array_equal(plain, restarted)
    # progressive (SOF2 spectral-selection + successive-approximation)
    # codes identical quantized coefficients -> identical pixels
    progressive = jpeg.decode_pixels(jpeg.encode_jpeg(img, progressive=True))
    assert np.array_equal(plain, progressive)


@given(
    seed=st.integers(0, 2**31 - 1),
    nbytes=st.integers(0, 400),
    magic=st.integers(0, 11),
)
@settings(max_examples=200, deadline=1000)
def test_decoders_contract_on_arbitrary_bytes(seed, nbytes, magic):
    """r9: the quarantine routers catch exactly ValueError /
    NotImplementedError, so EVERY decoder must hold the two-exception
    contract on fully ARBITRARY bytes — not just corrupted-valid
    payloads (the older fuzz). Random buffers, optionally prefixed with
    a real container magic so the parser commits to a branch before
    the garbage starts, must never hang, never return from a clearly
    impossible parse with raw IndexError/KeyError/struct.error, and
    never kill the router with anything but the contract pair."""
    import numpy as np

    from realtime_market_data_pipeline_spark.operators import multimodal as mm

    rng = np.random.default_rng(seed)
    body = bytes(rng.integers(0, 256, size=nbytes, dtype=np.uint8))
    prefixes = [
        b"", b"BM", b"P6", mm.PNG_SIG, b"\xff\xd8", b"RIFF", b"fLaC",
        b"ID3", b"\xff\xfb", b"OggS", b"GIF89a", b"GIF87a",
    ]
    payload = prefixes[magic] + body
    for dec in (mm.probe_media, mm.decode_image, mm.decode_audio,
                mm.decode_avi):
        try:
            dec(payload)
        except (ValueError, NotImplementedError):
            pass

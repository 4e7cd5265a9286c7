"""Per-codec µs/payload microbenchmark (r9, closes r8 verdict #2/#8).

The multimodal decode queries are CPU-per-row operators: their bench
time is n_payloads x per-payload-decode-cost spread over cores, plus
fixed Spark overhead. When the family's bench numbers drift together,
the first question is whether the CODEC cost moved (a real per-row
regression that scales to 100 TB) or only the harness (planting, JVM
warmup, machine variance — flat costs that vanish at scale). This
script isolates the codec term: pure-Python encode+decode per payload,
no Spark, deterministic planted payloads identical to the corpus
arithmetic the queries use.

Run: python scripts/codec_microbench.py [n_payloads]
Prints one JSON line: {codec: microseconds_per_payload, ...} —
the maintained numbers live in SURVEY.md §9's codec cost table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from realtime_market_data_pipeline_spark.operators import multimodal as mm


def _time_per_payload(fn, payloads: list, reps: int = 3) -> float:
    """Best-of-reps mean µs per payload (best-of damps scheduler noise)."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for p in payloads:
            fn(p)
        dt = (time.perf_counter() - t0) / len(payloads) * 1e6
        best = min(best, dt)
    return round(best, 1)


def main(n: int = 200) -> dict:
    ids = list(range(n))
    bmp = [mm.make_bmp(d, (d % 13) + 4, (d % 11) + 4) for d in ids]
    wav = [mm.make_wav(d, (d % 23) + 8, 8000 + (d % 5) * 1000) for d in ids]
    png = [mm.make_png(d, (d % 13) + 4, (d % 11) + 4) for d in ids]
    jpg_base = [mm.make_jpeg(d) for d in ids if d % 2 == 0]
    jpg_prog = [mm.make_jpeg(d) for d in ids if d % 2 == 1]
    from realtime_market_data_pipeline_spark.operators import flac as fl

    def _make_flac(d: int) -> bytes:
        n = (d % 23) + 8
        samples = [((d * 31 + i * 17) % 65536) - 32768 for i in range(n)]
        return fl.encode_flac(
            [samples], sample_rate=8000 + (d % 5) * 1000, block_size=8
        )

    flac = [_make_flac(d) for d in ids]
    avi = [mm.make_avi(d, (d % 6) + 2, (d % 4) + 2, (d % 7) + 2) for d in ids]
    mjpeg = [
        mm.make_avi_mjpeg(d, 8 * ((d % 3) + 1), 8 * ((d % 2) + 1),
                          (d % 5) + 2)
        for d in ids
    ]
    gif = [mm.make_gif(d, (d % 13) + 4, (d % 11) + 4) for d in ids]
    mixed = [
        mm.make_bmp(d, 5, 4) if d % 6 == 0
        else mm.make_wav(d, 10, 8000) if d % 6 == 1
        else mm.make_jpeg(d) if d % 6 == 2
        else mm.make_avi(d, 4, 3, 3) if d % 6 == 3
        else mm.make_mp3_frames(d, 3) if d % 6 == 4
        else mm.make_ogg(d, 3)
        for d in ids
    ]

    out = {
        "n_payloads": n,
        "decode_bmp": _time_per_payload(mm.decode_image, bmp),
        "decode_wav": _time_per_payload(mm.decode_audio, wav),
        "decode_png": _time_per_payload(mm.decode_image, png),
        "decode_jpeg_baseline": _time_per_payload(mm.decode_image, jpg_base),
        "decode_jpeg_progressive": _time_per_payload(
            mm.decode_image, jpg_prog
        ),
        "decode_flac": _time_per_payload(mm.decode_audio, flac),
        "decode_avi": _time_per_payload(mm.decode_avi, avi),
        "decode_avi_mjpeg": _time_per_payload(mm.decode_avi, mjpeg),
        "decode_gif": _time_per_payload(mm.decode_image, gif),
        "probe_mixed": _time_per_payload(mm.probe_media, mixed),
        "encode_jpeg": None,  # filled below: planting cost, lru-cached
    }
    # planting cost with a cold cache is what the bench's t1 pays;
    # time the encode WITHOUT clearing caches (steady-state, like the
    # query's per-row cost after the first few payloads)
    t0 = time.perf_counter()
    for d in ids:
        mm.make_jpeg(d)
    out["encode_jpeg"] = round((time.perf_counter() - t0) / n * 1e6, 1)
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    print(json.dumps(main(n)))

"""Audio-curation pipeline scaling benchmark (secondary north-rule
evidence, complementing bench.py's validation-suite numbers).

The measured job is the CANONICALIZE -> FINGERPRINT -> NEAR-DUP pipeline
a training-data curation run executes before validation:

    clips -> audio_resample(16000) -> audio_trim_silence
          -> audio_normalize_gain(peak -3dBFS)
          -> audio_fingerprints (persisted narrow table, one payload scan)
          -> audio_near_duplicates (banded-LSH pair join)

Same methodology as bench.py run_scaling: identical job at local[1] and
local[4] (the representative N -> 4N stand-in on this box — <=4 of 32
cores keeps per-thread DRAM bandwidth cluster-like), interleaved sessions,
best-of per level. Prints ONE JSON line.

    python tools/bench_curation.py            # defaults: n=48000 clips
    SPARK_GRAFT_CUR_CLIPS=96000 python tools/bench_curation.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CLIPS = int(os.environ.get("SPARK_GRAFT_CUR_CLIPS", "48000"))
SEED = 42
MIN_MS, SPREAD_MS = 460, 80  # realistic ~0.5s speech-length clips
SESSIONS = int(os.environ.get("SPARK_GRAFT_CUR_SESSIONS", "2"))
CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".bench_cache",
)


def _session(cores: int):
    from voluptuous_spark.session import get_spark

    return get_spark(
        app_name=f"bench_curation_local{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
        extra_conf={"spark.ui.enabled": "false"},
    )


def _pipeline_wall(cores: int, clips_path: str) -> dict:
    from pyspark.storagelevel import StorageLevel

    from voluptuous_spark.audio import (
        audio_fingerprints,
        audio_near_duplicates,
        audio_normalize_gain,
        audio_resample,
        audio_trim_silence,
    )

    spark = _session(cores)
    clips = spark.read.parquet(clips_path)
    t0 = time.time()
    canon = audio_normalize_gain(
        audio_trim_silence(audio_resample(clips, 16000)),
        target_dbfs=-3.0,
    )
    # persist the NARROW fingerprint table (id + 8 bytes/clip) so the
    # near-dup self-join never re-runs the payload scan — the documented
    # single-payload-scan shape for large corpora
    fp = audio_fingerprints(canon).select("clip_id", "afp").persist(
        StorageLevel.MEMORY_AND_DISK_DESER
    )
    fp.count()
    pairs = audio_near_duplicates(
        canon, fingerprints=fp, max_hamming=7, n_lsh_bands=8
    )
    n_pairs = pairs.count()
    wall = time.time() - t0
    fp.unpersist()
    spark.stop()
    return {
        "cores": cores,
        "wall_sec": round(wall, 3),
        "clips_per_sec": round(N_CLIPS / wall, 1),
        "near_dup_pairs": int(n_pairs),
    }


def main() -> int:
    from voluptuous_spark.datasynth import write_clips

    tag = f"cur_clips_{N_CLIPS}_{SEED}_{MIN_MS}ms"
    clips_path = f"{CACHE_DIR}/{tag}/clips.parquet"
    if not os.path.exists(clips_path):
        spark = _session(32)
        write_clips(spark, N_CLIPS, f"{CACHE_DIR}/{tag}", seed=SEED,
                    partitions=64, min_ms=MIN_MS, spread_ms=SPREAD_MS)
        spark.stop()

    levels = (1, 4)
    runs: dict[int, list] = {c: [] for c in levels}
    for _ in range(SESSIONS):
        for c in levels:  # interleaved: every level samples every epoch
            runs[c].append(_pipeline_wall(c, clips_path))
    best = {c: min(rs, key=lambda r: r["wall_sec"]) for c, rs in runs.items()}
    for c in levels:
        best[c]["session_walls"] = [r["wall_sec"] for r in runs[c]]
    eff = (best[4]["clips_per_sec"] / best[1]["clips_per_sec"]) / 4.0
    print(json.dumps({
        "metric": "curation pipeline clips/sec "
                  "(resample+trim+normalize+fingerprint+near-dup)",
        "n_clips": N_CLIPS,
        "local1": best[1],
        "local4": best[4],
        "scaling_efficiency_n1_to_4": round(eff, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

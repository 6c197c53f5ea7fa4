"""Unattended TPU perf sweep: one subprocess per configuration, strictly
serialized (TWO concurrent TPU processes crash the axon worker).

Each configuration runs bench.py forward-only at reduced pass count and
appends one JSON line to the output file; analyze afterwards and target
the winners. Configurations cover the round-3 levers from VERDICT:
kernel ablations (what the per-visit epilogue really costs), shading
chunk policy, pool bounce fusion, and kernel block geometry.

Usage: python scripts/perf_sweep.py [out.jsonl] [cfg1,cfg2,...]
(default /tmp/sweep.jsonl, all configs)
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sweep.jsonl"

BASE = {"BENCH_GRAD": "0", "BENCH_GOLDEN": "0", "BENCH_MESH": "0",
        "BENCH_MFU": "0", "BENCH_PASSES": "4", "BENCH_WARMUP": "1"}

CONFIGS = [
    ("baseline", {}),
    # kernel ablations: measure the cost stack of a visit
    ("ablate_novisit", {"CRAYTPU_FLASH_ABLATE": "novisit"}),
    ("ablate_noepilogue", {"CRAYTPU_FLASH_ABLATE": "noepilogue"}),
    ("ablate_noextract", {"CRAYTPU_FLASH_ABLATE": "noextract"}),
    # division-light winner epilogue (bitwise-sign validity)
    ("epi_lean", {"CRAYTPU_FLASH_EPI": "lean"}),
    # vectorized-culling kernel (phase-0/1/2 population passes)
    ("v3", {"CRAYTPU_FLASH_V3": "1"}),
    ("v3_lean", {"CRAYTPU_FLASH_V3": "1", "CRAYTPU_FLASH_EPI": "lean"}),
    # natural-layout rays: in-kernel transpose replaces pack_rays_T
    ("natrays", {"CRAYTPU_FLASH_NATRAYS": "1"}),
    ("v3_natrays", {"CRAYTPU_FLASH_V3": "1",
                    "CRAYTPU_FLASH_NATRAYS": "1"}),
    ("v3_lean_natrays", {"CRAYTPU_FLASH_V3": "1",
                         "CRAYTPU_FLASH_EPI": "lean",
                         "CRAYTPU_FLASH_NATRAYS": "1"}),
    # occupancy-weighted M-split: each 1/N lane column group of a ray
    # block gates on its OWN slab mask (kernel time ~ output tiles, so a
    # tri-block passing only one group costs 1/N of the tiles)
    ("msplit2", {"CRAYTPU_FLASH_MSPLIT": "2"}),
    ("msplit3", {"CRAYTPU_FLASH_MSPLIT": "3"}),
    ("msplit6", {"CRAYTPU_FLASH_MSPLIT": "6"}),
    ("msplit2_rb1024", {"CRAYTPU_FLASH_MSPLIT": "2",
                        "CRAYTPU_RAY_BLOCK": "1024"}),
    # shading policy: unchunked (new default) vs 64k chunks (old default)
    ("shade_chunk64k", {"CRAYTPU_SHADE_CHUNK": "65536"}),
    # pool bounce fusion at full occupancy
    ("pool_k2", {"CRAYTPU_POOL_K": "2"}),
    # kernel geometry
    ("rb512", {"CRAYTPU_RAY_BLOCK": "512"}),
    ("sb16", {"CRAYTPU_SB_BLOCKS": "16"}),
]


def main():
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    results = []
    for name, env_over in CONFIGS:
        if only is not None and name not in only:
            continue
        env = dict(os.environ, **BASE, **env_over)
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "-u", os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=2400)
        line = None
        for ln in (p.stdout or "").strip().splitlines()[::-1]:
            if ln.startswith("{"):
                line = json.loads(ln)
                break
        rec = {"config": name, "env": env_over,
               "wall_s": round(time.time() - t0, 1),
               "rc": p.returncode,
               "paths_per_sec": line.get("value") if line else None}
        if line is None:
            rec["stderr_tail"] = (p.stderr or "")[-800:]
        results.append(rec)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        time.sleep(10)       # let the axon worker settle between runs
    print(f"\nwrote {OUT}")


if __name__ == "__main__":
    main()

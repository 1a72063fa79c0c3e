"""Pre-build the shared lattice tree caches (utils/treecache) for the
resolutions the round-3 knob ladders and bench need. /tmp is wiped every
session, so this is the first TPU job of each session: ~11 min at 256^3,
~18 min at 1024^3, ~10 min at 2048^3 on the tunneled chip (cold jit).

Usage: python scripts/prebuild_caches.py [res ...]   (default 256 1024 2048)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from massivevoxelraytracing_tpu.utils import runtime  # noqa: E402

runtime.setup()

from massivevoxelraytracing_tpu.utils import treecache  # noqa: E402


def main():
    resolutions = [int(a) for a in sys.argv[1:]] or [256, 1024, 2048]
    for res in resolutions:
        path = treecache.cache_path(res)
        if os.path.exists(path):
            print(f"[prebuild] {res}^3 already cached at {path}", flush=True)
            continue
        t0 = time.time()
        tree = treecache.lattice_tree(res)
        print(
            f"[prebuild] {res}^3 built+cached in {time.time()-t0:.0f}s: "
            f"voxels={tree.n_voxels} bricks={tree.n_bricks} -> {path}",
            flush=True,
        )


if __name__ == "__main__":
    main()
